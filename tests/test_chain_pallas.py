"""Pallas chaining-DP kernel vs the XLA scan implementation.

The scan implementation is itself golden-tested (test_engine_device);
here the fused kernel must match it bit-for-bit: same candidate scores,
same break/skip semantics, same first-max predecessor choice.
"""

import numpy as np
import pytest

from rawalign_tpu.map import chain as dchain
from rawalign_tpu.map import chain_pallas

KW = dict(window=64, e=6, max_gap=2000, max_target_gap=5000, max_skips=25)


def _mk(rng, B, A, n_segments=4, diag_runs=True):
    seg = np.sort(rng.integers(0, n_segments, (B, A)), axis=1).astype(np.int32)
    tgt = rng.integers(0, 50000, (B, A)).astype(np.int32)
    qry = rng.integers(0, 2000, (B, A)).astype(np.int32)
    idx = np.lexsort((qry, tgt, seg), axis=1)
    for b in range(B):
        tgt[b] = tgt[b][idx[b]]
        qry[b] = qry[b][idx[b]]
        seg[b] = seg[b][idx[b]]
    if diag_runs:
        # co-linear runs so real chains (and skip-counter paths) trigger
        for b in range(B):
            k = int(rng.integers(0, A - 50))
            for j in range(40):
                tgt[b, k + j] = tgt[b, k] + j * 10
                qry[b, k + j] = qry[b, k] + j * 9
    return seg, tgt, qry


@pytest.mark.parametrize("seed,B,A", [(0, 3, 256), (1, 5, 512), (2, 2, 1024)])
def test_chain_pallas_matches_scan(seed, B, A):
    rng = np.random.default_rng(seed)
    seg, tgt, qry = _mk(rng, B, A)
    n_anch = np.full(B, A, np.int32)
    n_anch[0] = A // 3
    want = dchain.chain_dp_batch(seg, tgt, qry, n_anch, **KW)
    got = chain_pallas.chain_dp_batch_pallas(
        seg, tgt, qry, n_anch, interpret=True, **KW
    )
    np.testing.assert_array_equal(
        np.asarray(want.scores), np.asarray(got.scores)
    )
    np.testing.assert_array_equal(np.asarray(want.preds), np.asarray(got.preds))


def test_chain_pallas_sentinel_padding():
    """Unused anchor slots (SENT segment) must not affect real anchors."""
    rng = np.random.default_rng(7)
    seg, tgt, qry = _mk(rng, 2, 128)
    SENT = np.int32(0x7FFFFFFF)
    seg[:, 100:] = SENT
    n_anch = np.full(2, 100, np.int32)
    want = dchain.chain_dp_batch(seg, tgt, qry, n_anch, **KW)
    got = chain_pallas.chain_dp_batch_pallas(
        seg, tgt, qry, n_anch, interpret=True, **KW
    )
    np.testing.assert_array_equal(
        np.asarray(want.scores), np.asarray(got.scores)
    )
    np.testing.assert_array_equal(np.asarray(want.preds), np.asarray(got.preds))
