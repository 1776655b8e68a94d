"""Command-line entry points (replacing the reference's tf.app.flags
per-model scripts with preset-driven CLIs)."""
