"""Command-line entry points (python -m maveric_slam_tpu.cli.<tool>)."""
