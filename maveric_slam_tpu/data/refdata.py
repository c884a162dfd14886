"""Parsers for the reference's baked C data headers.

The reference "serializes" all fixture data as C arrays in headers under
/root/reference/include/data/ (quantized SuperPoint grids, float features,
GT softmax grids, the BoW vocabulary). These are *data assets*, not code;
we parse them into numpy arrays for differential tests and for the
vocabulary the loop-closure scorer needs. Results are memoized in-process
and cached on disk as npz next to this module.

Formats (reference):
- quantized_image0.h: int8 semi[1920][65]/desc[1920][256] + scales, patch
  order = col*24 + row (superpoint_inference.py:637-664).
- pair0_gt.h: float max-softmax prob + argmax index per cell, [80][24]
  (superpoint_inference.py:666-711).
- pair0.h / pair10.h: float keypoints xs/ys/scores + [N][256] descriptors.
- vocabulary.h: scale/bias per base node, base_descriptors[256][10] (stored
  as unsigned bytes, must be viewed as int8), leaf_descriptors[10][1000][4].
"""

from __future__ import annotations

import functools
import os
import re

import numpy as np

REFERENCE_ROOT = os.environ.get("MAVERIC_REFERENCE_ROOT", "/root/reference")
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_refcache")


def _parse_c_arrays(text: str):
    """Extract `const <type> name[...] = {...};` blocks and scalar consts."""
    arrays = {}
    # Scalars: const int name = 5;
    for m in re.finditer(r"const\s+\w+\s+(\w+)\s*=\s*([-\d.eE+]+)\s*;", text):
        val = m.group(2)
        arrays[m.group(1)] = float(val) if ("." in val or "e" in val or "E" in val) else int(val)
    # Arrays: const type name[d0][d1]... = { ... };
    for m in re.finditer(
        r"const\s+(\w+)\s+(\w+)((?:\s*\[\s*\d+\s*\])+)\s*=\s*\{(.*?)\}\s*;",
        text,
        re.DOTALL,
    ):
        ctype, name, dims_s, body = m.groups()
        dims = tuple(int(d) for d in re.findall(r"\d+", dims_s))
        body = body.replace("{", " ").replace("}", " ")
        tokens = body.replace(",", " ").split()
        if tokens and tokens[0].startswith(("0b", "0B", "0x", "0X")):
            # Binary/hex literals (vocabulary.h leaf words).
            flat = np.array([int(t, 0) for t in tokens], dtype=np.float64)
        else:
            flat = np.array(tokens, dtype=np.float64)
        n = int(np.prod(dims))
        flat = flat[:n]
        if flat.size != n:
            raise ValueError(f"{name}: expected {n} values, got {flat.size}")
        if ctype == "int8_t":
            # Some headers store unsigned byte values in int8_t declarations
            # (e.g. vocabulary.h base_descriptors) — wrap like C would.
            arr = flat.astype(np.int64).astype(np.uint8).view(np.int8)
        elif ctype in ("int", "int32_t", "uint32_t"):
            arr = flat.astype(np.int64)
        else:
            arr = flat.astype(np.float32)
        arrays[name] = arr.reshape(dims)
    return arrays


@functools.lru_cache(maxsize=None)
def load_header(rel_path: str):
    """Parse a reference data header (cached in-process and on disk)."""
    src = os.path.join(REFERENCE_ROOT, rel_path)
    cache = os.path.join(_CACHE_DIR, rel_path.replace("/", "_") + ".npz")
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(src):
        with np.load(cache, allow_pickle=False) as z:
            return dict(z)
    with open(src) as f:
        arrays = _parse_c_arrays(f.read())
    os.makedirs(_CACHE_DIR, exist_ok=True)
    np.savez_compressed(cache, **arrays)
    return arrays


def quantized_image0():
    """int8 semi/desc grids for image0 + scales, in (Hc, Wc, C) layout."""
    d = load_header("include/data/quantized/quantized_image0.h")
    hc, wc = int(d["image0_feature_rows"]), int(d["image0_feature_cols"])
    # Header patch order: patch = col * Hc + row.
    semi = d["image0_semi"].reshape(wc, hc, 65).transpose(1, 0, 2)
    desc = d["image0_desc"].reshape(wc, hc, 256).transpose(1, 0, 2)
    return {
        "semi": semi,
        "desc": desc,
        "semi_scale": float(d["image0_semi_scale"]),
        "desc_scale": float(d["image0_desc_scale"]),
    }


def gt_softmax_grids():
    """Float GT max-prob / argmax grids for image0 and image1, (Hc, Wc)."""
    d = load_header("include/data/quantized/pair0_gt.h")
    out = {}
    for i in (0, 1):
        probs = d[f"image{i}_probs_gt"].transpose(1, 0)  # [80][24] -> (24, 80)
        idx = d[f"image{i}_indices_gt"].transpose(1, 0)
        out[f"probs{i}"] = probs.astype(np.float32)
        out[f"indices{i}"] = idx.astype(np.int32)
    return out


def float_features(pair: str = "pair0"):
    """Float keypoints + descriptors for a baked pair header."""
    d = load_header(f"include/data/tracking/{pair}.h")
    out = {}
    for i in (0, 1):
        out[f"xs{i}"] = d[f"image{i}_feature_xs"].astype(np.int32)
        out[f"ys{i}"] = d[f"image{i}_feature_ys"].astype(np.int32)
        out[f"scores{i}"] = d[f"image{i}_feature_scores"].astype(np.float32)
        out[f"desc{i}"] = d[f"image{i}_feature_descriptors"].astype(np.float32)
    return out


def vocabulary():
    """BoW vocabulary: base node affine params + descriptors + leaf words.

    Note the reference reads leaf words as int[8] while they are int[4]
    (OOB bug, bow_main.c:115 vs vocabulary.h:272); we use the true 4-word
    (128-bit) layout.
    """
    d = load_header("include/data/LCD/vocabulary.h")
    return {
        "num_base_nodes": int(d["num_base_nodes"]),
        "words_per_base_node": int(d["words_per_base_node"]),
        "scale": d["scale_arr"].astype(np.float32),
        "bias": d["bias_arr"].astype(np.float32),
        # Stored [256][10]; we want (num_nodes, 256).
        "base_descriptors": np.ascontiguousarray(
            d["base_descriptors"].astype(np.int8).transpose(1, 0)
        ),
        "leaf_descriptors": d["leaf_descriptors"].astype(np.int64).astype(np.uint32),
    }
