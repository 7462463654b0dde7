"""Fused stage1+chain: one device dispatch runs events + sketch +
lookup + hit expansion + carried merge + 4-key sort + chain DP; the
host replays expansion+lexsort so preds index its arrays exactly.
PAF must be identical to the two-step path, including rounds that
escalate (true anchor count > the fused round's static width)."""

import re

import numpy as np
import pytest

from rawalign_tpu import config
from rawalign_tpu.config import MappingFlag
from rawalign_tpu.index import index as dindex
from rawalign_tpu.io import paf
from rawalign_tpu.map import engine as dengine
from rawalign_tpu.testing import synth


def _strip_mt(line: str) -> str:
    return re.sub(r"\tmt:f:[^\t]*", "", line)


def _paf(eng, reads):
    return sorted(_strip_mt(paf.paf_line(r)) for r in eng.map_reads(iter(reads)))


@pytest.fixture(scope="module")
def ds_setup():
    ds = synth.make_dataset(
        seed=21,
        genome_lengths=[15000, 8000],
        n_reads=10,
        read_len_bp=(200, 700),  # long reads -> multi-chunk, carried anchors
    )
    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    mo.max_events_per_chunk = 256
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    reads = [(r.name, r.signal) for r in ds.reads]
    rng = np.random.default_rng(5)
    reads.append(("noise", rng.normal(95, 15, 9000).astype(np.float32)))
    return idx, mo, reads


def test_fused_matches_unfused(ds_setup):
    idx, mo, reads = ds_setup
    eng_u = dengine.MappingEngine(idx, mo, batch_size=8, fused=False, stage1_impl="device")
    lines_u = _paf(eng_u, reads)
    eng_f = dengine.MappingEngine(idx, mo, batch_size=8, fused=True)
    lines_f = _paf(eng_f, reads)
    assert lines_f == lines_u
    # multi-chunk reads must actually have exercised the carried-anchor
    # upload (ci > 1 somewhere); this in-budget workload must not
    # escalate (the fused width is the full anchor budget)
    assert any("ci:i:2" in ln or "ci:i:3" in ln for ln in lines_f)
    assert eng_f.counters["fused_escalations"] == 0


def test_fused_prefix_refetch(ds_setup):
    """A downloaded prefix narrower than the replayed anchor count must
    trigger the device-resident DP refetch — and still match."""
    idx, mo, reads = ds_setup
    eng_u = dengine.MappingEngine(idx, mo, batch_size=8, fused=False, stage1_impl="device")
    lines_u = _paf(eng_u, reads)
    eng_f = dengine.MappingEngine(idx, mo, batch_size=8, fused=True)
    eng_f._fused_p = 64  # force the refetch path
    lines_f = _paf(eng_f, reads)
    assert lines_f == lines_u
    assert eng_f.counters["fused_refetches"] > 0


def test_fused_escalation_path(ds_setup):
    """A fused width BELOW the workload's true anchor count must
    escalate to the two-step path (counted) and the PAF must STILL be
    identical (the escalated rounds also exercise the over-budget
    occ-ranked anchor drop against the unfused engine at the same
    budget)."""
    idx, mo, reads = ds_setup
    eng_u = dengine.MappingEngine(
        idx, mo, batch_size=8, fused=False, stage1_impl="device", max_anchors=256,
        max_anchors_ceiling=256
    )
    lines_u = _paf(eng_u, reads)
    eng_f = dengine.MappingEngine(
        idx, mo, batch_size=8, fused=True, max_anchors=256
    )
    lines_f = _paf(eng_f, reads)
    assert lines_f == lines_u
    assert eng_f.counters["fused_escalations"] > 0


def test_fused_over_budget_device_drop(ds_setup):
    """Rows over the anchor budget but within the 2x expansion width
    stay FUSED: the device replicates the host's occ-ranked drop
    exactly, so the PAF still matches the unfused engine."""
    idx, mo, reads = ds_setup
    eng_u = dengine.MappingEngine(
        idx, mo, batch_size=8, fused=False, stage1_impl="device", max_anchors=512,
        max_anchors_ceiling=512
    )
    lines_u = _paf(eng_u, reads)
    assert eng_u.counters["anchors_dropped"] > 0  # budget actually hit
    eng_f = dengine.MappingEngine(
        idx, mo, batch_size=8, fused=True, max_anchors=512
    )
    lines_f = _paf(eng_f, reads)
    assert lines_f == lines_u
    assert eng_f.counters["anchors_dropped"] > 0
    # at least one over-budget round must have stayed fused (the whole
    # point of the on-device drop)
    assert (
        eng_f.counters["fused_escalations"] < eng_f.phase_times["rounds"]
    )


def test_occ_ranked_drop_prefers_low_occurrence_seeds():
    """The over-budget policy keeps anchors of low-occurrence seeds and
    carried anchors (occ 0), dropping repetitive seeds first."""
    occ = np.array([5, 5, 5, 5, 5, 1, 1, 0, 3, 3, 3], np.int64)
    order = np.arange(occ.size)
    A = 6
    keep_rank = np.argsort(occ[order], kind="stable")[:A]
    keep_rank.sort()
    kept = occ[order[keep_rank]]
    assert (kept <= 3).all() and kept.size == A
    assert 0 in kept and (kept == 1).sum() == 2 and (kept == 3).sum() == 3


def test_fused_device_sort_matches_lexsort():
    """The device 4-key sort order (seg, tgt, qry, idx) must equal
    np.lexsort((qry, tgt, seg)) with its stable tie-break."""
    import jax

    rng = np.random.default_rng(9)
    n = 500
    seg = rng.integers(0, 4, n).astype(np.int32)
    tgt = rng.integers(0, 50, n).astype(np.int32)  # many ties
    qry = rng.integers(0, 20, n).astype(np.int32)
    idx = np.arange(n, dtype=np.int32)
    order_np = np.lexsort((qry, tgt, seg))
    _, _, _, idx_s = jax.lax.sort(
        tuple(map(np.asarray, (seg, tgt, qry, idx))), num_keys=4
    )
    np.testing.assert_array_equal(np.asarray(idx_s), idx[order_np])
