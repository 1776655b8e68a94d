"""SPMD parallelism: device meshes + shard_map data-parallel training."""
