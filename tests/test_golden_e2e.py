"""End-to-end golden-model test: build an index over a synthetic genome,
map simulated reads, and verify mapping accuracy and PAF structure.

This mirrors the reference's evaluation flow (test/evaluation/read_mapping)
with synthetic data standing in for the (non-redistributable) datasets."""

import numpy as np
import pytest

from rawalign_tpu import config
from rawalign_tpu.golden import engine as gengine
from rawalign_tpu.golden import index as gindex
from rawalign_tpu.io import paf
from rawalign_tpu.testing import synth


@pytest.fixture(scope="module")
def dataset():
    return synth.make_dataset(
        seed=7,
        genome_lengths=[20_000, 10_000],
        n_reads=12,
        read_len_bp=(300, 900),
        noise_pa=1.2,
    )


@pytest.fixture(scope="module")
def built_index(dataset):
    io = config.IndexOptions()
    mo = config.MappingOptions()
    config.set_opt("viral", io, mo)
    return gindex.build_index(dataset.seqs, dataset.model.pore_vals, io), io


def _map_all(dataset, idx, mo):
    results = []
    for read in dataset.reads:
        results.append(gengine.map_read(idx, read.signal, read.name, mo))
    return results


def _check_accuracy(dataset, results, min_correct_frac=0.8):
    n_correct = 0
    n_mapped = 0
    for read, res in zip(dataset.reads, results):
        if not res.mapped:
            continue
        n_mapped += 1
        ok = (
            res.ref_name == dataset.seqs[read.ref_id].name
            and res.rev == read.strand
        )
        if ok:
            # position overlap check in forward bp coordinates
            lo = res.fragment_start_position
            hi = res.fragment_start_position + res.fragment_length
            ok = not (hi < read.ref_start or lo > read.ref_end)
        n_correct += bool(ok)
    assert n_mapped >= len(dataset.reads) * 0.7, f"only {n_mapped} mapped"
    assert n_correct >= n_mapped * min_correct_frac, (
        f"{n_correct}/{n_mapped} correct"
    )
    return n_mapped, n_correct


def test_e2e_chaining_only(dataset, built_index):
    idx, io = built_index
    mo = config.MappingOptions()
    config.set_opt("viral", io, mo)
    results = _map_all(dataset, idx, mo)
    _check_accuracy(dataset, results)
    for res in results:
        line = paf.paf_line(res)
        fields = line.split("\t")
        assert len(fields) >= 13
        assert "mt:f:" in line and "ci:i:" in line and "sl:i:" in line


def test_e2e_dtw_sparse_banded(dataset, built_index):
    """The flagship configuration: --dtw-evaluate-chains
    --dtw-border-constraint sparse --dtw-fill-method banded=0.10."""
    idx, io = built_index
    mo = config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(config.MappingFlag.DTW_EVALUATE_CHAINS)
    results = _map_all(dataset, idx, mo)
    n_mapped, n_correct = _check_accuracy(dataset, results)
    # DTW filtering should not destroy recall on clean synthetic reads
    assert n_correct >= 8


def test_e2e_cigar_output(dataset, built_index):
    idx, io = built_index
    mo = config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(config.MappingFlag.DTW_EVALUATE_CHAINS)
    mo.set_flag(config.MappingFlag.DTW_OUTPUT_CIGAR)
    read = dataset.reads[0]
    res = gengine.map_read(idx, read.signal, read.name, mo)
    if res.mapped:
        assert "alns:f:" in res.tags and "aln:s:" in res.tags
        assert "(" in res.tags.split("aln:s:")[1]


def test_unmappable_read(built_index):
    """Pure-noise reads must come out unmapped under DTW evaluation —
    filtering chance chains is exactly RawAlign's contribution over
    chaining-only RawHash."""
    idx, io = built_index
    mo = config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(config.MappingFlag.DTW_EVALUATE_CHAINS)
    rng = np.random.default_rng(0)
    noise = rng.normal(95.0, 15.0, size=30_000).astype(np.float32)
    res = gengine.map_read(idx, noise, "noise_read", mo)
    line = paf.paf_line(res)
    assert line.split("\t")[2] == "*" or res.mapped is False
