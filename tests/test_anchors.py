"""map/anchors.py batched expansion == the per-read reference loop.

The naive implementation below replicates the engine's original
per-read expansion (hits in seed order + carried, np.lexsort, occ-ranked
over-budget drop) — the ordering contract the chaining DP's stable
tie-breaks depend on."""

import numpy as np

from rawalign_tpu.map import anchors as manchors

SENT = np.int32(0x7FFFFFFF)


def naive_expand(
    h_lo, h_qpos, h_count, live, offsets, carried_lists, val_id, val_ps, A
):
    B, NS = h_count.shape
    seg_b = np.full((B, A), SENT, dtype=np.int32)
    tgt_b = np.zeros((B, A), dtype=np.int32)
    qry_b = np.zeros((B, A), dtype=np.int32)
    n_anch = np.zeros(B, dtype=np.int32)
    max_used = max_true = dropped = 0
    for i in range(B):
        if not live[i]:
            continue
        counts = h_count[i]
        sel = np.nonzero(counts)[0]
        if sel.size:
            reps = counts[sel]
            starts = h_lo[i][sel]
            total = int(reps.sum())
            base = np.repeat(starts, reps)
            offs = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
            hidx = base + offs
            tid = val_id[hidx].astype(np.int64)
            ps = val_ps[hidx]
            tpos = ((ps >> np.uint32(1)) & np.uint32(0x7FFFFFFF)).astype(
                np.int64
            )
            seg = tid * 2 + (ps & np.uint32(1)).astype(np.int64)
            qpos = np.repeat(h_qpos[i][sel], reps).astype(np.int64) + offsets[i]
            occ = np.repeat(reps, reps).astype(np.int64)
        else:
            seg = tpos = qpos = occ = np.zeros(0, np.int64)
        if i in carried_lists:
            cs, ct, cq = carried_lists[i]
            seg = np.concatenate([seg, cs])
            tpos = np.concatenate([tpos, ct])
            qpos = np.concatenate([qpos, cq])
            occ = np.concatenate([occ, np.zeros(cs.size, np.int64)])
        order = np.lexsort((qpos, tpos, seg))
        max_true = max(max_true, order.size)
        if order.size > A:
            dropped += order.size - A
            keep_rank = np.argsort(occ[order], kind="stable")[:A]
            keep_rank.sort()
            order = order[keep_rank]
        m = order.size
        seg_b[i, :m] = seg[order]
        tgt_b[i, :m] = tpos[order]
        qry_b[i, :m] = qpos[order]
        n_anch[i] = m
        max_used = max(max_used, m)
    return seg_b, tgt_b, qry_b, n_anch, max_used, max_true, dropped


import pytest


@pytest.mark.parametrize("impl", ["numpy", "native"])
def test_expand_round_matches_naive(impl):
    if impl == "native":
        from rawalign_tpu import native

        if not native.expand_round_available():
            pytest.skip("native lib not built")
        fn = native.expand_round
    else:
        fn = manchors.expand_round_numpy
    rng = np.random.default_rng(5)
    for trial in range(8):
        B = int(rng.integers(1, 10))
        NS = int(rng.integers(1, 40))
        A = int(rng.choice([8, 32, 128]))
        V = 500
        val_id = rng.integers(0, 3, V).astype(np.uint32)
        val_ps = rng.integers(0, 2**20, V).astype(np.uint32)
        h_count = rng.integers(0, 5, (B, NS)).astype(np.int32)
        h_count[rng.random((B, NS)) < 0.5] = 0
        h_lo = rng.integers(0, V - 5, (B, NS)).astype(np.int32)
        h_qpos = rng.integers(0, 300, (B, NS)).astype(np.int32)
        live = rng.random(B) < 0.8
        offsets = rng.integers(0, 1000, B).astype(np.int64)
        carried_lists = {}
        for i in range(B):
            if live[i] and rng.random() < 0.5:
                m = int(rng.integers(1, 30))
                carried_lists[i] = (
                    rng.integers(0, 6, m).astype(np.int64),
                    rng.integers(0, 2000, m).astype(np.int64),
                    rng.integers(0, 500, m).astype(np.int64),
                )
        want = naive_expand(
            h_lo, h_qpos, h_count, live, offsets, carried_lists,
            val_id, val_ps, A,
        )
        seg_b = np.full((B, A), SENT, dtype=np.int32)
        tgt_b = np.zeros((B, A), dtype=np.int32)
        qry_b = np.zeros((B, A), dtype=np.int32)
        n_anch = np.zeros(B, dtype=np.int32)
        got = fn(
            h_lo, h_qpos, h_count, live, offsets, carried_lists,
            val_id, val_ps, A, seg_b, tgt_b, qry_b, n_anch,
        )
        np.testing.assert_array_equal(seg_b, want[0], err_msg=f"trial {trial}")
        np.testing.assert_array_equal(tgt_b, want[1])
        np.testing.assert_array_equal(qry_b, want[2])
        np.testing.assert_array_equal(n_anch, want[3])
        assert got == (want[4], want[5], want[6]), trial
