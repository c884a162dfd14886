#!/usr/bin/env python
"""Emit the byte-popcount lookup table as a C array.

Capability of the reference's python/create_lookup_table.py (the LUT backs
its scalar Hamming counter, bow_main.c:11). The TPU engine uses the
hardware `lax.population_count` instead; this tool exists for C consumers.
"""

print(
    "const int8_t count_lookup[256] = {"
    + ", ".join(str(bin(i).count("1")) for i in range(256))
    + ", };"
)
