"""BoW vocabulary: descriptor -> visual-word assignment on TPU.

Capability of the reference's bow_main.c: base-node selection by int8
descriptor x vocabulary matmul with per-node affine calibration
(bow_main.c:78-100), sign-binarization (:13-39), and flattened-tree leaf
search by Hamming similarity over 128-bit binary words (:109-124).

TPU formulation: the base-node scores are one (N,256)x(256,10) MXU matmul;
the leaf search is XOR + `lax.population_count` on int32 lanes over all
1000 words of each feature's node at once (a (N,1000,4) gather + one fused
VPU pass) instead of a scalar LUT loop.

Reference bugs not replicated: the leaf words are 4x32 = 128 bits
(vocabulary.h:272) but the reference compares 8 ints — an out-of-bounds
read (bow_main.c:115); and it feeds int8 buffers through a float matmul
signature. We use the true 128-bit layout and integer arithmetic.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class Vocabulary(NamedTuple):
    base_descriptors: jnp.ndarray  # (B, 256) int8
    scale: jnp.ndarray  # (B,) float32 per-node affine scale
    bias: jnp.ndarray  # (B,) float32 per-node affine bias
    leaf_words: jnp.ndarray  # (B, W, 4) uint32 — 128-bit binary words
    num_base_nodes: int
    words_per_base_node: int


def load_reference_vocabulary() -> Vocabulary:
    """Load the vocabulary baked into the reference's data headers."""
    from ..data import refdata

    v = refdata.vocabulary()
    return Vocabulary(
        base_descriptors=jnp.asarray(v["base_descriptors"], jnp.int8),
        scale=jnp.asarray(v["scale"]),
        bias=jnp.asarray(v["bias"]),
        leaf_words=jnp.asarray(v["leaf_descriptors"], jnp.uint32),
        num_base_nodes=v["num_base_nodes"],
        words_per_base_node=v["words_per_base_node"],
    )


@jax.jit
def binarize_descriptors(desc_q: jnp.ndarray) -> jnp.ndarray:
    """Sign-binarize (N, 256) int8 descriptors into (N, 8) uint32 words.

    Bit layout matches the reference (bow_main.c:13-39, positive scale
    branch): word i packs descriptor entries [i*32, (i+1)*32), MSB first.
    Note the vocabulary's leaf words are only 128 bits (vocabulary.h:272);
    the leaf search compares the first 4 words. (The reference compared all
    8 against the 4-word leaves — an out-of-bounds read, bow_main.c:115.)
    """
    bits = (desc_q > 0).astype(jnp.uint32)  # (N, 256)
    n = desc_q.shape[0]
    w = bits.reshape(n, 8, 32)
    shifts = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    return jnp.sum(w << shifts[None, None, :], axis=-1, dtype=jnp.uint32)


class WordAssignment(NamedTuple):
    base_node: jnp.ndarray  # (N,) int32
    word: jnp.ndarray  # (N,) int32 leaf word within the node
    word_id: jnp.ndarray  # (N,) int32 global id = base*W + word
    matching_bits: jnp.ndarray  # (N,) int32 Hamming similarity of the win


@partial(jax.jit, static_argnames=("vocab_static", "positive_gate"))
def _assign_words_impl(desc_q, desc_scale, mask, vocab, vocab_static, positive_gate):
    b, wpn = vocab_static
    # --- base node: one int8 MXU matmul + per-node affine ------------------
    dots = jax.lax.dot_general(
        desc_q,
        vocab.base_descriptors.T,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)  # (N, B)
    s = dots * desc_scale / 256.0  # the accelerator's mvout 1/256 scaling
    scores = vocab.scale[None, :] * s + 256.0 * vocab.bias[None, :]
    base = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    if positive_gate:
        # Reference semantics: keep argmax only if score > 0 (max_score
        # starts at 0, bow_main.c:90). With this vocabulary's calibration
        # every score is negative, so the gate collapses ALL features onto
        # node 0 — a reference bug; default is the plain argmax.
        base = jnp.where(jnp.max(scores, axis=-1) > 0, base, 0)

    # --- leaf search: XOR + popcount against the node's 1000 words ---------
    feat_bits = binarize_descriptors(desc_q)[:, :4]  # first 128 bits
    node_words = vocab.leaf_words[base]  # (N, W, 4) uint32
    diff = jnp.bitwise_xor(feat_bits[:, None, :], node_words)
    matching = 128 - jnp.sum(
        jax.lax.population_count(diff), axis=-1
    ).astype(jnp.int32)  # (N, W)
    word = jnp.argmax(matching, axis=-1).astype(jnp.int32)
    best = jnp.take_along_axis(matching, word[:, None], axis=-1)[:, 0]

    word_id = base * wpn + word
    invalid = ~mask
    return WordAssignment(
        base_node=jnp.where(invalid, -1, base),
        word=jnp.where(invalid, -1, word),
        word_id=jnp.where(invalid, -1, word_id),
        matching_bits=jnp.where(invalid, 0, best),
    )


def assign_words(
    desc_q: jnp.ndarray,  # (N, 256) int8 feature descriptors
    desc_scale,
    mask: jnp.ndarray,  # (N,) bool
    vocab: Vocabulary,
    positive_gate: bool = False,
) -> WordAssignment:
    """Quantize N descriptors to visual words (bow_main.c main path).

    positive_gate=True reproduces the reference's score>0 base-node gate
    (which degenerates to node 0 on its own vocabulary); the default uses
    the full 10-node tree.
    """
    return _assign_words_impl(
        desc_q,
        jnp.float32(desc_scale),
        mask,
        vocab,
        (vocab.num_base_nodes, vocab.words_per_base_node),
        positive_gate,
    )
