"""Fuzz the batched native round tail (ra_round_chains +
ra_round_finalize) against the per-read Python path it replaces, on
randomized DP inputs — covers ties, empty rows, single-anchor chains
and abandoned-chain edge cases the end-to-end tests may not hit."""

import numpy as np
import pytest

from rawalign_tpu import config, native
from rawalign_tpu.config import MappingFlag
from rawalign_tpu.golden import chain as gchain
from rawalign_tpu.golden import engine as gengine
from rawalign_tpu.io import paf
from rawalign_tpu.map import postprocess

pytestmark = pytest.mark.skipif(
    not (native.available() and native.round_tail_available()),
    reason="native round tail unavailable",
)

B, A = 6, 256
N_SEQ = 3
HMAX = 4096
LREF = 10_000


def _random_round(rng, use_dtw):
    """Random sorted anchors -> real chain DP -> (inputs, opt)."""
    io = config.IndexOptions()
    mo = config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    if use_dtw:
        mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    seg_b = np.full((B, A), np.int32(0x7FFFFFFF), np.int32)
    tgt_b = np.zeros((B, A), np.int32)
    qry_b = np.zeros((B, A), np.int32)
    n_anch = np.zeros(B, np.int32)
    gate = np.zeros(B, np.uint8)
    for b in range(B):
        if rng.random() < 0.2:
            continue  # empty / gated-off row
        gate[b] = 1
        m = int(rng.integers(2, A))
        segs = rng.integers(0, 2 * N_SEQ, m)
        # clustered targets make plausible chains; diagonal-ish queries
        t = rng.integers(0, 3000, m)
        q = np.clip(t + rng.integers(-50, 50, m), 0, None)
        order = np.lexsort((q, t, segs))
        seg_b[b, :m] = segs[order]
        tgt_b[b, :m] = t[order]
        qry_b[b, :m] = q[order]
        n_anch[b] = m
    scores, preds = native.chain_dp(
        seg_b, tgt_b, qry_b, n_anch, window=64, e=io.e,
        max_gap=mo.max_gap_length, max_target_gap=mo.max_target_gap_length,
        max_skips=mo.max_num_skips,
    )
    return io, mo, seg_b, tgt_b, qry_b, scores, preds, n_anch, gate


def _segbase():
    tbl = np.zeros(2 * N_SEQ, np.int64)
    for s in range(2 * N_SEQ):
        tbl[s] = 100 * s
    return tbl


def _python_tail(mo, seg_b, tgt_b, qry_b, scores, preds, n_anch, gate,
                 use_dtw, segbase, evbase):
    """The per-read Python path _round_tail/_round_tail_post used before
    the native port (chains + descs + runs)."""
    per_read = {}
    all_descs = []
    runs = {}
    off = 0
    for b in range(B):
        if not gate[b]:
            continue
        ch = postprocess.chains_from_dp_fast(
            seg_b[b], tgt_b[b], qry_b[b], scores[b], preds[b],
            int(n_anch[b]), mo,
        )
        if use_dtw:
            ch.sort(key=lambda c: c.chaining_score, reverse=True)
        per_read[b] = ch
        if use_dtw:
            for ci, c in enumerate(ch):
                ref_base = int(
                    segbase[c.reference_sequence_index * 2 + c.strand]
                )
                rows = postprocess.build_chain_tile_descs_vec(
                    c, ref_base, int(evbase[b]), mo
                )
                if len(rows):
                    all_descs.append(rows)
                    runs[(b, ci)] = (off, off + len(rows))
                    off += len(rows)
    descs = (
        np.concatenate(all_descs)
        if all_descs
        else np.zeros((0, 6), np.int64)
    )
    return per_read, descs, runs


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("use_dtw", [False, True])
def test_round_chains_matches_python(seed, use_dtw):
    rng = np.random.default_rng(seed)
    io, mo, seg_b, tgt_b, qry_b, scores, preds, n_anch, gate = _random_round(
        rng, use_dtw
    )
    segbase = _segbase()
    evbase = np.arange(B, dtype=np.int64) * HMAX + LREF
    rec = native.round_chains(
        seg_b, tgt_b, qry_b, scores, preds, n_anch, gate, A,
        min_chaining_score=mo.min_chaining_score,
        num_best_chains=mo.num_best_chains,
        min_num_anchors=mo.min_num_anchors,
        disable_filter=False, sort_for_dtw=use_dtw, use_dtw=use_dtw,
        border_global=False, fill_full=False,
        band_frac=mo.dtw_band_radius_frac, segbase=segbase, ev_base=evbase,
    )
    (ch_read, ch_score, ch_seg, ch_start_t, ch_end_t, ch_nanch,
     ch_aoff, ch_at, ch_aq, ch_doff, descs) = rec
    per_read, py_descs, _runs = _python_tail(
        mo, seg_b, tgt_b, qry_b, scores, preds, n_anch, gate, use_dtw,
        segbase, evbase,
    )
    k = 0
    for b in range(B):
        for c in per_read.get(b, []):
            assert ch_read[k] == b
            assert ch_score[k] == c.chaining_score
            assert ch_seg[k] == c.reference_sequence_index * 2 + c.strand
            assert ch_start_t[k] == c.start_position
            assert ch_end_t[k] == c.end_position
            assert ch_nanch[k] == c.n_anchors
            lo, hi = int(ch_aoff[k]), int(ch_aoff[k + 1])
            assert np.array_equal(ch_at[lo:hi], c.anchors[:, 0])
            assert np.array_equal(ch_aq[lo:hi], c.anchors[:, 1])
            k += 1
    assert k == ch_read.size
    assert np.array_equal(descs, py_descs)


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("use_dtw", [False, True])
def test_round_finalize_matches_python(seed, use_dtw):
    rng = np.random.default_rng(100 + seed)
    io, mo, seg_b, tgt_b, qry_b, scores, preds, n_anch, gate = _random_round(
        rng, use_dtw
    )
    segbase = _segbase()
    evbase = np.arange(B, dtype=np.int64) * HMAX + LREF
    rec = native.round_chains(
        seg_b, tgt_b, qry_b, scores, preds, n_anch, gate, A,
        min_chaining_score=mo.min_chaining_score,
        num_best_chains=mo.num_best_chains,
        min_num_anchors=mo.min_num_anchors,
        disable_filter=False, sort_for_dtw=use_dtw, use_dtw=use_dtw,
        border_global=False, fill_full=False,
        band_frac=mo.dtw_band_radius_frac, segbase=segbase, ev_base=evbase,
    )
    n_descs = rec[10].shape[0]
    # random costs, some large enough to abandon chains
    costs = (rng.random(n_descs) * 30).astype(np.float32)
    fin = native.round_finalize(
        rec, B, costs, use_dtw=use_dtw, border_global=False,
        match_bonus=mo.dtw_match_bonus, dtw_min_score=mo.dtw_min_score,
        min_bestmap_ratio=mo.min_bestmap_ratio,
        min_meanmap_ratio=mo.min_meanmap_ratio,
        min_chain_anchor=mo.min_chain_anchor,
    )
    per_read, _descs, runs = _python_tail(
        mo, seg_b, tgt_b, qry_b, scores, preds, n_anch, gate, use_dtw,
        segbase, evbase,
    )
    for b in range(B):
        if not gate[b]:
            continue
        chains = per_read.get(b, [])
        if use_dtw:
            part_costs = [
                costs[runs[(b, ci)][0] : runs[(b, ci)][1]]
                if (b, ci) in runs
                else np.zeros(0, np.float32)
                for ci in range(len(chains))
            ]
            chains = postprocess.bnb_replay(chains, part_costs, mo)
        if chains:
            chains = gchain.gen_primary_chains(chains, mo)
            gchain.comp_mapq(chains, mo)

        class _Shim:
            pass

        shim = _Shim()
        shim.chains = chains
        want_dec = gengine.is_mapped_with_high_confidence(shim, mo)
        assert bool(fin["decision"][b]) == want_dec, (b, seed)
        assert int(fin["nc"][b]) == len(chains), (b, seed)
        if not chains:
            continue
        c0 = chains[0]
        assert fin["seg"][b] == c0.reference_sequence_index * 2 + c0.strand
        assert fin["start_t"][b] == c0.start_position
        assert fin["end_t"][b] == c0.end_position
        assert fin["nanch0"][b] == c0.n_anchors
        assert fin["q_start"][b] == c0.anchors[c0.n_anchors - 1][1]
        assert fin["q_end"][b] == c0.anchors[0][1]
        assert fin["mapq"][b] == c0.mapq
        assert fin["s1"][b] == c0.chaining_score
        want_s2 = chains[1].chaining_score if len(chains) > 1 else 0.0
        assert fin["s2"][b] == want_s2
        assert fin["sm"][b] == np.float32(
            paf.mean_score_f32([c.chaining_score for c in chains])
        )
        at, aq = paf.anchor_gap_means_f32(c0.anchors)
        assert fin["at"][b] == np.float32(at)
        assert fin["aq"][b] == np.float32(aq)
        # carried anchors == concatenated primary-chain anchors
        lo, hi = int(fin["car_off"][b]), int(fin["car_off"][b + 1])
        want_seg, want_t, want_q = [], [], []
        for c in chains:
            s = c.reference_sequence_index * 2 + c.strand
            for t, q in c.anchors:
                want_seg.append(s)
                want_t.append(int(t))
                want_q.append(int(q))
        assert np.array_equal(fin["car_seg"][lo:hi], want_seg)
        assert np.array_equal(fin["car_t"][lo:hi], want_t)
        assert np.array_equal(fin["car_q"][lo:hi], want_q)
