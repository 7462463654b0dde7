"""Native host library vs golden model parity."""

import numpy as np
import pytest

from rawalign_tpu import config, native
from rawalign_tpu.golden import events as gevents
from rawalign_tpu.golden import sketch as gsketch

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host library unavailable"
)


@pytest.mark.parametrize("e,q,lq", [(6, 9, 3), (7, 9, 3), (5, 9, 3)])
def test_native_sketch_reg_matches_golden(e, q, lq):
    rng = np.random.default_rng(0)
    v = rng.normal(0, 1, 3000).astype(np.float32)
    # inject some near-duplicates to exercise the suppression filter
    v[::7] = v[1::7][: v[::7].size] if False else v[::7]
    h, p = native.sketch_reg(v, e, q, lq)
    want = gsketch.sketch_reg(v, sid=0, strand=0, e=e, q=q, lq=lq, k=6)
    wh = (want[:, 0] >> np.uint64(6)).astype(np.uint32)
    wp = ((want[:, 1] & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    np.testing.assert_array_equal(h, wh)
    np.testing.assert_array_equal(p, wp)


@pytest.mark.parametrize("w", [3, 5, 10])
def test_native_sketch_min_matches_golden(w):
    rng = np.random.default_rng(1)
    v = rng.normal(0, 1, 2000).astype(np.float32)
    h, p = native.sketch_min(v, w, 6, 9, 3)
    want = gsketch.sketch_min(v, sid=0, strand=0, w=w, e=6, q=9, lq=3, k=6)
    wh = (want[:, 0] >> np.uint64(6)).astype(np.uint32)
    wp = ((want[:, 1] & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    np.testing.assert_array_equal(h, wh)
    np.testing.assert_array_equal(p, wp)


def test_native_gen_peaks_matches_golden():
    rng = np.random.default_rng(2)
    sig = rng.normal(95, 10, 4000).astype(np.float32)
    opt = config.MappingOptions()
    ps, pss = gevents.prefix_sums(sig)
    t1 = gevents.tstat(ps, pss, sig.size, opt.window_length1)
    t2 = gevents.tstat(ps, pss, sig.size, opt.window_length2)
    want = gevents.gen_peaks(
        t1, t2, sig.size, opt.threshold1, opt.threshold2,
        opt.window_length1, opt.window_length2, opt.peak_height,
    )
    got = native.gen_peaks(
        t1, t2, sig.size, opt.threshold1, opt.threshold2,
        opt.window_length1, opt.window_length2, opt.peak_height,
    )
    np.testing.assert_array_equal(got, want)


def test_native_chain_dp_matches_device():
    """Fuzz the host C chaining DP against the device kernel
    (map/chain.py) — bit-identical scores and predecessor choices
    (rmap.cpp:427-484 semantics, window-bounded)."""
    from rawalign_tpu.map import chain as dchain

    if not native.chain_dp_available():
        pytest.skip("native lib without ra_chain_dp")
    rng = np.random.default_rng(7)
    for _ in range(12):
        B = int(rng.integers(1, 6))
        A = int(rng.integers(4, 260))
        n = rng.integers(0, A + 1, B).astype(np.int32)
        seg = np.full((B, A), 0x7FFFFFFF, np.int32)
        tgt = np.zeros((B, A), np.int32)
        qry = np.zeros((B, A), np.int32)
        for b in range(B):
            m = n[b]
            s = rng.integers(0, 4, m)
            t = rng.integers(0, 3000, m)
            q = rng.integers(0, 500, m)
            o = np.lexsort((q, t, s))
            seg[b, :m], tgt[b, :m], qry[b, :m] = s[o], t[o], q[o]
        W = int(rng.choice([8, 64, 128]))
        kw = dict(window=W, e=6, max_gap=2000, max_target_gap=5000,
                  max_skips=25)
        ns, npred = native.chain_dp(seg, tgt, qry, n, **kw)
        dp = dchain.chain_dp_batch(seg, tgt, qry, n, **kw)
        np.testing.assert_array_equal(ns, np.asarray(dp.scores))
        np.testing.assert_array_equal(npred, np.asarray(dp.preds))


def test_engine_paf_identical_native_vs_device_chain():
    """The engine produces byte-identical PAF with chain_impl='native'
    and 'device' (mt:f timing tag excluded)."""
    import re

    from rawalign_tpu import config as cfg
    from rawalign_tpu.config import MappingFlag
    from rawalign_tpu.index import index as dindex
    from rawalign_tpu.io import paf
    from rawalign_tpu.map.engine import MappingEngine
    from rawalign_tpu.testing import synth

    if not native.chain_dp_available():
        pytest.skip("native lib without ra_chain_dp")
    ds = synth.make_dataset(
        seed=11, genome_lengths=[8000, 4000], n_reads=12,
        read_len_bp=(150, 300),
    )
    io, mo = cfg.IndexOptions(), cfg.MappingOptions()
    cfg.set_opt("viral", io, mo)
    mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    mo.max_events_per_chunk = 256
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    reads = [(r.name, r.signal) for r in ds.reads]
    strip = lambda s: re.sub(r"\tmt:f:[^\t]*", "", s)
    pafs = {}
    for impl in ("native", "device"):
        eng = MappingEngine(idx, mo, batch_size=8, chain_impl=impl)
        pafs[impl] = sorted(
            strip(paf.paf_line(r)) for r in eng.map_reads(iter(reads))
        )
    assert pafs["native"] == pafs["device"]
    assert any("\t+" in ln or "\t-" in ln for ln in pafs["native"])


def test_native_chains_from_dp_matches_python():
    """C candidate selection + traceback == Python chains_from_dp on
    randomized DP outputs (chain set, order, scores, anchors), and the
    vectorized tile-descriptor builder row-matches the scalar one."""
    from rawalign_tpu import config as cfg
    from rawalign_tpu.map import chain as dchain
    from rawalign_tpu.map import postprocess

    if not native.chains_from_dp_available():
        pytest.skip("native lib without ra_chains_from_dp")
    opt = cfg.MappingOptions()
    opt.set_flag(cfg.MappingFlag.DTW_EVALUATE_CHAINS)
    rng = np.random.default_rng(13)
    for trial in range(10):
        A = int(rng.integers(8, 400))
        m = int(rng.integers(0, A + 1))
        s = rng.integers(0, 4, m)
        t = rng.integers(0, 3000, m)
        q = rng.integers(0, 500, m)
        o = np.lexsort((q, t, s))
        seg = np.full(A, 0x7FFFFFFF, np.int32)
        tgt = np.zeros(A, np.int32)
        qry = np.zeros(A, np.int32)
        seg[:m], tgt[:m], qry[:m] = s[o], t[o], q[o]
        dp = dchain.chain_dp_batch(
            seg[None], tgt[None], qry[None],
            np.asarray([m], np.int32),
            window=64, e=6, max_gap=2000, max_target_gap=5000, max_skips=25,
        )
        sc = np.asarray(dp.scores)[0]
        pr = np.asarray(dp.preds)[0]
        want = postprocess.chains_from_dp(seg, tgt, qry, sc, pr, m, opt)
        got = postprocess.chains_from_dp_fast(seg, tgt, qry, sc, pr, m, opt)
        assert len(got) == len(want), trial
        for cw, cg in zip(want, got):
            assert cg.chaining_score == cw.chaining_score
            assert cg.reference_sequence_index == cw.reference_sequence_index
            assert cg.strand == cw.strand
            assert cg.start_position == cw.start_position
            assert cg.end_position == cw.end_position
            assert cg.n_anchors == cw.n_anchors
            np.testing.assert_array_equal(cg.anchors, cw.anchors)
            rows_w = postprocess.build_chain_tile_descs(cw, 100, 9000, opt)
            rows_g = postprocess.build_chain_tile_descs_vec(cg, 100, 9000, opt)
            np.testing.assert_array_equal(
                np.asarray(rows_w, np.int64).reshape(-1, 6), rows_g
            )
