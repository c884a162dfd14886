"""BoW word assignment + loop-closure scoring vs C-semantics oracles,
run on the real reference vocabulary and real quantized descriptors."""

import numpy as np
import pytest

from maveric_slam_tpu.data import refdata
from maveric_slam_tpu.loopclosure import lcd, vocab as vocab_lib
from maveric_slam_tpu.ops import softmax_topn


@pytest.fixture(scope="module")
def vocab():
    return vocab_lib.load_reference_vocabulary()


@pytest.fixture(scope="module")
def features():
    """Top-100 features of image0, like bow_main.c:62-77."""
    q = refdata.quantized_image0()
    grid = softmax_topn.approx_softmax_grid(
        q["semi"], np.float32(q["semi_scale"])
    )
    top = softmax_topn.top_n_select(grid, n=100, mode="reference")
    desc = q["desc"].reshape(-1, 256)[np.asarray(top.cells)]
    return desc, q["desc_scale"], np.asarray(top.mask)


def oracle_binarize(feature):
    """bow_main.c:13-39 (positive-scale branch), one descriptor."""
    out = np.zeros(8, np.uint32)
    for i in range(8):
        w = 0
        for j in range(32):
            w = (w << 1) | (1 if feature[i * 32 + j] > 0 else 0)
        out[i] = w
    return out


def oracle_count_matching(a, b):
    """bow_main.c:41-51 with the OOB bug fixed (4 words, not 8)."""
    count = 0
    for i in range(4):
        matching = ~(int(a[i]) ^ int(b[i])) & 0xFFFFFFFF
        count += bin(matching).count("1")
    return count


class TestBinarize:
    def test_matches_oracle(self, features):
        desc, _, _ = features
        got = np.asarray(vocab_lib.binarize_descriptors(desc))
        for i in range(0, 100, 7):
            np.testing.assert_array_equal(got[i], oracle_binarize(desc[i]), str(i))


class TestAssignWords:
    def test_base_node_matches_oracle(self, features, vocab):
        desc, scale, mask = features
        got = vocab_lib.assign_words(desc, scale, mask, vocab)
        base = np.asarray(vocab.base_descriptors, np.int64)  # (10, 256)
        s = desc.astype(np.int64) @ base.T * scale / 256.0
        scores = np.asarray(vocab.scale)[None] * s + 256.0 * np.asarray(vocab.bias)[None]
        want = scores.argmax(-1)
        # The reference's score>0 gate (bow_main.c:90) degenerates to node 0
        # on its own vocabulary; check that bug-compatible mode too.
        gated = vocab_lib.assign_words(desc, scale, mask, vocab, positive_gate=True)
        want_gated = np.where(scores.max(-1) > 0, scores.argmax(-1), 0)
        np.testing.assert_array_equal(np.asarray(gated.base_node)[mask], want_gated[mask])
        np.testing.assert_array_equal(
            np.asarray(got.base_node)[mask], want[mask]
        )

    def test_leaf_word_matches_oracle(self, features, vocab):
        desc, scale, mask = features
        got = vocab_lib.assign_words(desc, scale, mask, vocab)
        leaves = np.asarray(vocab.leaf_words)
        for i in range(0, 100, 11):
            if not mask[i]:
                continue
            b = int(np.asarray(got.base_node)[i])
            fb = oracle_binarize(desc[i])[:4]
            counts = [
                oracle_count_matching(fb, leaves[b, w]) for w in range(1000)
            ]
            want = int(np.argmax(counts))
            assert int(np.asarray(got.word)[i]) == want, i
            assert int(np.asarray(got.matching_bits)[i]) == max(counts)

    def test_invalid_features_masked(self, features, vocab):
        desc, scale, mask = features
        m2 = mask.copy()
        m2[:10] = False
        got = vocab_lib.assign_words(desc, scale, m2, vocab)
        assert (np.asarray(got.word_id)[:10] == -1).all()


class TestLoopDatabase:
    def oracle_merge_join(self, ids_a, ids_b):
        """lcd_main.c:52-74: sorted-list intersection count."""
        a = sorted(set(ids_a))
        b = sorted(set(ids_b))
        i = j = n = 0
        while i < len(a) and j < len(b):
            if a[i] == b[j]:
                n += 1
                i += 1
                j += 1
            elif a[i] < b[j]:
                i += 1
            else:
                j += 1
        return n

    def test_scores_match_merge_join(self):
        rng = np.random.default_rng(31)
        db = lcd.create_database(max_frames=64, vocab_size=10000)
        frames = []
        for f in range(20):
            ids = rng.choice(10000, size=rng.integers(50, 200), replace=False)
            frames.append(ids)
            padded = np.full(256, -1, np.int32)
            padded[: len(ids)] = ids
            db = lcd.add_frame(db, padded, f)

        q_ids = frames[3]  # re-query an old frame's words
        padded = np.full(256, -1, np.int32)
        padded[: len(q_ids)] = q_ids
        res = lcd.query(db, padded, current_frame=np.int32(20), min_frame_gap=5)
        scores = np.asarray(res.scores)
        for f in range(15):  # outside the recency window
            want = self.oracle_merge_join(frames[f], q_ids)
            assert scores[f] == want, (f, scores[f], want)
        # Perfect self-match is the best candidate.
        assert int(res.best) == 3
        assert float(res.best_score) == 1.0

    def test_recency_gating(self):
        rng = np.random.default_rng(32)
        db = lcd.create_database(max_frames=64, vocab_size=10000)
        ids = rng.choice(10000, 100, replace=False)
        padded = np.full(256, -1, np.int32)
        padded[:100] = ids
        for f in range(10):
            db = lcd.add_frame(db, padded, f)  # identical recent frames
        res = lcd.query(db, padded, current_frame=np.int32(10), min_frame_gap=50)
        # All stored frames are recent: no candidate despite perfect scores.
        assert int(res.best) == -1

    def test_ring_buffer_wraps(self):
        db = lcd.create_database(max_frames=4, vocab_size=100)
        for f in range(6):
            ids = np.full(8, -1, np.int32)
            ids[0] = f * 10
            db = lcd.add_frame(db, ids, f)
        assert int(db.next_slot) == 2
        assert np.asarray(db.valid).all()
        # Slots 0/1 were overwritten by frames 4/5.
        assert np.asarray(db.frames).tolist() == [4, 5, 2, 3]

    def test_recency_correct_past_wraparound(self):
        """Recency gating must track frame numbers, not slot indices: after
        the ring wraps, low slot indices hold the *newest* frames."""
        rng = np.random.default_rng(33)
        cap = 8
        db = lcd.create_database(max_frames=cap, vocab_size=1000)
        word_sets = []
        n_frames = 3 * cap + 2  # wraps the ring twice
        for f in range(n_frames):
            ids = rng.choice(1000, 64, replace=False).astype(np.int32)
            word_sets.append(ids)
            db = lcd.add_frame(db, ids, f)

        # Query with the words of the oldest still-stored frame; with a gap
        # of 3 the most recent 3 frames are ineligible even though they sit
        # at *low* slot indices post-wrap.
        oldest = n_frames - cap
        res = lcd.query(
            db, word_sets[oldest], current_frame=np.int32(n_frames),
            min_frame_gap=3, min_score=0.5,
        )
        assert int(res.best_frame) == oldest
        assert float(res.best_score) == 1.0
        frames_arr = np.asarray(db.frames)
        assert int(frames_arr[int(res.best)]) == oldest

        # Self-query of the newest frame: gated out by recency (would have
        # been *eligible* under slot arithmetic after the wrap).
        res2 = lcd.query(
            db, word_sets[-1], current_frame=np.int32(n_frames),
            min_frame_gap=3, min_score=0.99,
        )
        assert int(res2.best) == -1
