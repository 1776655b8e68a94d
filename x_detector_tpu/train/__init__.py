"""Training: losses, schedules, train state, steps, checkpointing."""
