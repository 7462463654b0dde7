"""Sanitizer-analog selfcheck: sampled engine-vs-golden validation."""

import dataclasses

import numpy as np

from rawalign_tpu import config
from rawalign_tpu.index import index as dindex
from rawalign_tpu.map.engine import MappingEngine
from rawalign_tpu.selfcheck import SelfCheck, diff_results
from rawalign_tpu.testing import synth


def _setup(n_reads=8):
    ds = synth.make_dataset(
        seed=31, genome_lengths=[20000, 9000], n_reads=n_reads
    )
    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    mo.set_flag(config.MappingFlag.DTW_EVALUATE_CHAINS)
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    return ds, idx, mo


def test_selfcheck_clean_engine_passes():
    ds, idx, mo = _setup()
    checker = SelfCheck(idx, mo, fraction=1.0)
    eng = MappingEngine(idx, mo, batch_size=4, pipeline_depth=2)

    def reads():
        for r in ds.reads:
            checker.capture(r.name, r.signal)
            yield r.name, r.signal

    for res in eng.map_reads(reads()):
        checker.record(res)
    rep = checker.run()
    assert rep["n_checked"] == len(ds.reads)
    assert rep["n_divergent"] == 0, rep["divergences"]


def test_selfcheck_detects_tampered_result():
    ds, idx, mo = _setup(n_reads=4)
    checker = SelfCheck(idx, mo, fraction=1.0)
    eng = MappingEngine(idx, mo, batch_size=4, pipeline_depth=1)

    def reads():
        for r in ds.reads:
            checker.capture(r.name, r.signal)
            yield r.name, r.signal

    results = list(eng.map_reads(reads()))
    mapped = [r for r in results if r.mapped]
    assert mapped
    bad = dataclasses.replace(
        mapped[0], fragment_start_position=mapped[0].fragment_start_position + 777
    )
    for res in results:
        checker.record(bad if res is mapped[0] else res)
    rep = checker.run()
    assert rep["n_divergent"] == 1
    fields = {d["field"] for d in rep["divergences"]}
    assert "fragment_start_position" in fields


def test_selfcheck_sampling_deterministic():
    ds, idx, mo = _setup(n_reads=8)
    a = SelfCheck(idx, mo, fraction=0.5)
    b = SelfCheck(idx, mo, fraction=0.5)
    wa = [r.name for r in ds.reads if a.want(r.name)]
    wb = [r.name for r in ds.reads if b.want(r.name)]
    assert wa == wb
    assert 0 < len(wa) < len(ds.reads)


def test_diff_results_unmapped_vs_mapped():
    from rawalign_tpu.io import paf

    u = paf.MappingResult(read_name="x", read_length=100, mapped=False)
    m = paf.MappingResult(
        read_name="x", read_length=100, mapped=True, ref_name="s",
        fragment_start_position=5, fragment_length=50,
    )
    assert diff_results(u, m) == [("mapped", False, True)]
    assert diff_results(u, u) == []
