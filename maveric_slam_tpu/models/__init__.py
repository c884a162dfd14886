"""Neural models (SuperPoint feature network, float and int8 paths)."""
