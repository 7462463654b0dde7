"""Pin the reference's float32 PAF-tag arithmetic (rmap.cpp:698,707-729).

The reference accumulates the at/aq anchor-gap means and the sm mean
chain score as float32 left-folds and computes read_position_scale in
float32; round-3 emitted these in float64, which drifts in the last
printed digit on ~20% of reads (docs/byte_parity_r4.md). These tests fuzz
the vectorized helpers against direct scalar transcriptions of the C
loops.
"""

import numpy as np
import pytest

from rawalign_tpu.io import paf


def _scalar_gap_means(anchors):
    """Direct transcription of rmap.cpp:719-729 in np.float32 steps."""
    n = len(anchors)
    at = np.float32(0.0)
    aq = np.float32(0.0)
    for ai in range(n - 1):
        dt = np.uint32(
            (int(anchors[ai][0]) - int(anchors[ai + 1][0])) & 0xFFFFFFFF
        )
        dq = np.uint32(
            (int(anchors[ai][1]) - int(anchors[ai + 1][1])) & 0xFFFFFFFF
        )
        at = np.float32(at + np.float32(dt))
        aq = np.float32(aq + np.float32(dq))
    at = np.float32(at / np.float32(max(n, 1)))
    aq = np.float32(aq / np.float32(max(n, 1)))
    return float(at), float(aq)


@pytest.mark.parametrize("seed", range(8))
def test_anchor_gap_means_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 400))
    # descending positions like a traceback chain; occasional plateaus
    t = np.sort(rng.integers(0, 5_000_000, n).astype(np.uint32))[::-1]
    q = np.sort(rng.integers(0, 100_000, n).astype(np.uint32))[::-1]
    anchors = np.stack([t, q], axis=1)
    got = paf.anchor_gap_means_f32(anchors)
    want = _scalar_gap_means(anchors)
    assert got == want


def test_anchor_gap_means_single_anchor():
    assert paf.anchor_gap_means_f32(np.array([[5, 7]])) == (0.0, 0.0)


@pytest.mark.parametrize("seed", range(8))
def test_mean_score_f32_matches_scalar(seed):
    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(1, 40))
    scores = (rng.random(n) * 500).astype(np.float32)
    acc = np.float32(0.0)
    for s in scores:
        acc = np.float32(acc + np.float32(s))
    want = float(np.float32(acc / np.float32(n)))
    assert paf.mean_score_f32(list(scores)) == want


def test_mean_score_f32_empty():
    assert paf.mean_score_f32([]) == 0.0


@pytest.mark.parametrize("seed", range(8))
def test_position_scale_truncation_matches_scalar(seed):
    rng = np.random.default_rng(200 + seed)
    ci = int(rng.integers(1, 31))
    offset = int(rng.integers(1, 20_000))
    scale = paf.position_scale_f32(ci, 4000, offset, 4000, 450)
    # scalar: ((float)ci*4000/offset) / ((float)4000/450)
    num = np.float32(np.float32(np.float32(ci) * np.float32(4000))
                     / np.float32(offset))
    den = np.float32(np.float32(4000) / np.float32(450))
    assert scale == np.float32(num / den)
    pos = int(rng.integers(0, 50_000))
    assert paf.scale_pos(scale, pos) == int(
        np.float32(scale * np.float32(pos))
    )
