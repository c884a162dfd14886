"""Host-side utilities: trajectory IO, evaluation, profiling, checkpointing."""
