"""Dataset loading, preprocessing, and reference-artifact parsing."""
