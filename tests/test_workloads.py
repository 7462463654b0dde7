"""Workload-level checks mirroring the reference's evaluation tier 3
(SURVEY.md §4): relative abundance (test/evaluation/relative_abundance)
and contamination detection (test/evaluation/contamination).

The reference runs these as shell pipelines over real FAST5 sets; here
they run end-to-end on synthetic datasets through the same user-facing
surfaces (dataset dir -> tools/evaluate.py --abundance; index ->
MappingEngine for the contamination mixture)."""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawalign_tpu import config
from rawalign_tpu.io import fast5, fasta
from rawalign_tpu.pore_model import save_pore_model
from rawalign_tpu.testing import synth


@pytest.fixture(scope="module")
def abundance_dir(tmp_path_factory):
    """Two-genome mixture dataset dir in the tools/evaluate.py layout."""
    d = tmp_path_factory.mktemp("abundance")
    ds = synth.make_dataset(
        seed=11,
        genome_lengths=[15_000, 5_000],
        n_reads=16,
        read_len_bp=(250, 500),
        noise_pa=1.2,
    )
    fasta.write_fasta(str(d / "ref.fa"), [(s.name, s.seq) for s in ds.seqs])
    save_pore_model(str(d / "model.txt"), ds.model)
    fast5.write_fast5(
        str(d / "reads.fast5"), [(r.name, r.signal) for r in ds.reads]
    )
    with open(d / "truth.tsv", "w") as f:
        f.write("read\tref\tstrand\tstart\tend\n")
        for r in ds.reads:
            ref = ds.seqs[r.ref_id].name if r.ref_id >= 0 else "*"
            f.write(
                f"{r.name}\t{ref}\t{'+-'[r.strand]}\t"
                f"{r.ref_start}\t{r.ref_end}\n"
            )
    return d, ds


def test_relative_abundance_workload(abundance_dir, capsys):
    """The full relative-abundance pipeline (index -> map with
    --stop-min-anchor 2 -> per-ref mapped-fragment abundance vs truth;
    the analog of run_rawalign_banded_sparse_nominanchor.sh +
    table_relative_abundance.py)."""
    from tools import evaluate

    d, ds = abundance_dir
    args = types.SimpleNamespace(
        dataset=str(d), preset="fast", engine="device"
    )
    rc = evaluate.run_abundance(args)
    assert rc == 0
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.startswith("# max_abs_error")]
    assert lines, out
    max_err = float(lines[0].split("\t")[1])
    # both references must be detected with roughly truthful shares
    assert max_err < 0.30, out
    body = [ln.split("\t") for ln in out.splitlines()[1:] if "\t" in ln]
    est = {f[0]: float(f[1]) for f in body if not f[0].startswith("#")}
    for s in ds.seqs:
        assert est.get(s.name, 0.0) > 0.05, (s.name, out)


def test_contamination_detection_workload():
    """Viral-preset contamination screen: index ONLY the contaminant
    genome, feed a mixture of contaminant + host reads, and require the
    mapper to flag the contaminant reads while leaving host reads
    unmapped (the reference's contamination evaluation, viral preset)."""
    from rawalign_tpu.index import index as dindex
    from rawalign_tpu.map.engine import MappingEngine

    ds = synth.make_dataset(
        seed=13,
        genome_lengths=[12_000, 40_000],  # [contaminant, host]
        n_reads=20,
        read_len_bp=(250, 500),
        noise_pa=1.2,
    )
    io = config.IndexOptions()
    mo = config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(config.MappingFlag.DTW_EVALUATE_CHAINS)
    idx = dindex.build_index(ds.seqs[:1], ds.model.pore_vals, io)
    engine = MappingEngine(idx, mo, batch_size=8, pipeline_depth=1)
    results = {
        r.read_name: r
        for r in engine.map_reads([(r.name, r.signal) for r in ds.reads])
    }
    cont = [r for r in ds.reads if r.ref_id == 0]
    host = [r for r in ds.reads if r.ref_id == 1]
    assert len(cont) >= 3 and len(host) >= 3  # mixture actually mixed
    cont_hit = sum(1 for r in cont if results[r.name].mapped)
    host_hit = sum(1 for r in host if results[r.name].mapped)
    # detection: most contaminant reads map to the contaminant index
    assert cont_hit >= 0.8 * len(cont), (cont_hit, len(cont))
    # specificity: host reads must not be called contamination
    assert host_hit <= 0.1 * len(host), (host_hit, len(host))
    # the screen's verdict — contamination present
    frac = cont_hit / len(ds.reads)
    assert frac > 0.2
