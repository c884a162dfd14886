"""Multi-chip parallelism: meshes, sharded bundle adjustment, collectives."""
