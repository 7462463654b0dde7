"""CLI + IO + Sequence Until tests: the full user-facing path."""

import numpy as np
import pytest

from rawalign_tpu import cli, config
from rawalign_tpu.io import fast5, fasta
from rawalign_tpu.pore_model import save_pore_model
from rawalign_tpu.testing import synth
from rawalign_tpu.until import SequenceUntil, find_outlier


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli")
    ds = synth.make_dataset(
        seed=5,
        genome_lengths=[10_000],
        n_reads=6,
        read_len_bp=(250, 600),
        noise_pa=1.2,
    )
    fasta.write_fasta(str(d / "ref.fa"), [(s.name, s.seq) for s in ds.seqs])
    save_pore_model(str(d / "model.txt"), ds.model)
    fast5.write_fast5(
        str(d / "reads.fast5"), [(r.name, r.signal) for r in ds.reads]
    )
    return d, ds


def test_fast5_roundtrip(workdir):
    d, ds = workdir
    back = dict(fast5.read_fast5(str(d / "reads.fast5")))
    assert set(back) == {r.name for r in ds.reads}
    sig = back[ds.reads[0].name]
    orig = ds.reads[0].signal
    orig = orig[(orig > 30) & (orig < 200)]
    assert abs(sig.size - orig.size) < 5
    # DAC quantization error is bounded by half a DAC step
    m = min(sig.size, orig.size)
    assert np.max(np.abs(sig[:m] - orig[:m])) < 0.2


def test_cli_index_then_map(workdir, capsys):
    d, ds = workdir
    rc = cli.main(
        [
            "-x", "viral",
            "-p", str(d / "model.txt"),
            "-d", str(d / "ref.idx.npz"),
            str(d / "ref.fa"),
        ]
    )
    assert rc == 0
    rc = cli.main(
        [
            "-x", "viral",
            "--dtw-evaluate-chains",
            "--dtw-border-constraint", "sparse",
            "--dtw-fill-method", "banded=0.10",
            "--dtw-match-bonus", "0.4",
            "--dtw-min-score", "20.0",
            "-o", str(d / "out.paf"),
            str(d / "ref.idx.npz"),
            str(d / "reads.fast5"),
        ]
    )
    assert rc == 0
    lines = (d / "out.paf").read_text().strip().splitlines()
    assert len(lines) == len(ds.reads)
    n_mapped = sum(1 for ln in lines if ln.split("\t")[2] != "*")
    assert n_mapped >= 4
    for ln in lines:
        f = ln.split("\t")
        # 12 standard PAF columns + tag fields (tags are tab-separated)
        assert len(f) >= 13


def test_cli_golden_engine(workdir):
    d, ds = workdir
    rc = cli.main(
        [
            "-x", "viral",
            "--engine", "golden",
            "-o", str(d / "out_golden.paf"),
            str(d / "ref.idx.npz"),
            str(d / "reads.fast5"),
        ]
    )
    assert rc == 0
    assert (d / "out_golden.paf").read_text().strip()


def test_cli_errors(workdir, capsys):
    d, _ = workdir
    # indexing without pore model
    rc = cli.main([str(d / "ref.fa")])
    assert rc == 1
    # no query and no dump
    rc = cli.main(["-p", str(d / "model.txt"), str(d / "ref.fa")])
    assert rc == 1


def test_sequence_until_convergence():
    opt = config.MappingOptions()
    opt.tmin_reads = 10
    opt.ttest_freq = 10
    opt.tn_samples = 3
    su = SequenceUntil(2, opt)
    rng = np.random.default_rng(0)
    stopped_at = None
    for i in range(200):
        ref = int(rng.random() < 0.3)
        if su.add_mapped_read(ref, 500):
            stopped_at = i
            break
    assert stopped_at is not None  # stable abundance converges
    ab = su.abundance
    assert 0.5 < ab[0] < 0.9


def test_find_outlier():
    x = np.array([[0.5, 0.5], [0.5, 0.5], [0.9, 0.1]], dtype=np.float32)
    assert find_outlier(x) == pytest.approx(2 * 0.4**2, abs=1e-6)
    assert find_outlier(np.zeros((4, 3), np.float32)) == 0.0


def test_slow5_roundtrip(workdir, tmp_path):
    from rawalign_tpu.io import slow5

    d, ds = workdir
    path = str(tmp_path / "reads.slow5")
    slow5.write_slow5(path, [(r.name, r.signal) for r in ds.reads])
    back = dict(slow5.read_slow5(path))
    assert set(back) == {r.name for r in ds.reads}
    via_fast5 = dict(fast5.read_fast5(str(d / "reads.fast5")))
    for name, sig in back.items():
        # identical DAC quantization as the FAST5 writer -> same pA back
        np.testing.assert_allclose(sig, via_fast5[name], atol=1e-4)
    assert path in fast5.find_signal_files(str(tmp_path))


def test_cli_maps_slow5(workdir, tmp_path):
    from rawalign_tpu.io import slow5

    d, ds = workdir
    path = str(tmp_path / "reads.slow5")
    slow5.write_slow5(path, [(r.name, r.signal) for r in ds.reads])
    out = str(tmp_path / "out.paf")
    rc = cli.main(
        [
            str(d / "ref.fa"), path,
            "-p", str(d / "model.txt"),
            "-x", "viral", "--dtw-evaluate-chains",
            "--engine", "golden", "-o", out,
        ]
    )
    assert rc == 0
    lines = [l for l in open(out) if l.strip()]
    assert len(lines) == len(ds.reads)


def test_prefetch_matches_sync(workdir, tmp_path):
    from rawalign_tpu.io import slow5
    from rawalign_tpu.io.prefetch import prefetch_signals

    d, ds = workdir
    paths = []
    for i in range(4):
        p = str(tmp_path / f"part{i}.slow5")
        slow5.write_slow5(
            p, [(r.name, r.signal) for r in ds.reads[i::4]]
        )
        paths.append(p)
    sync = list(fast5.read_signals(paths))
    pre = list(prefetch_signals(paths, n_threads=3, depth=2))
    assert [n for n, _ in pre] == [n for n, _ in sync]
    for (_, a), (_, b) in zip(pre, sync):
        np.testing.assert_array_equal(a, b)


def test_cli_selfcheck(workdir, capsys):
    d, ds = workdir
    if not (d / "ref.idx.npz").exists():
        assert cli.main(
            ["-x", "viral", "-p", str(d / "model.txt"),
             "-d", str(d / "ref.idx.npz"), str(d / "ref.fa")]
        ) == 0
    rc = cli.main(
        [
            "-x", "viral",
            "--dtw-evaluate-chains",
            "--selfcheck", "1.0",
            "-o", str(d / "out_sc.paf"),
            str(d / "ref.idx.npz"),
            str(d / "reads.fast5"),
        ]
    )
    assert rc == 0
    err = capsys.readouterr().err
    assert "[M::selfcheck] ok:" in err, err


def test_cli_selfcheck_strict_exit_code(workdir, capsys, monkeypatch):
    """--selfcheck-strict turns a divergence report into a nonzero exit
    so automation can detect silent corruption without scraping stderr
    (ADVICE r3). The divergence is injected by tampering the golden
    comparison field set."""
    from rawalign_tpu.selfcheck import SelfCheck

    d, ds = workdir

    real_report = SelfCheck.report

    def tampered_report(self, stream=None):
        rep = real_report(self, stream)
        rep["n_divergent"] = 1  # simulate a diverging read
        return rep

    monkeypatch.setattr(SelfCheck, "report", tampered_report)
    args = [
        "-x", "viral", "--dtw-evaluate-chains",
        "--selfcheck", "1.0", "--selfcheck-strict",
        "-o", str(d / "out_sc2.paf"),
        str(d / "ref.idx.npz"), str(d / "reads.fast5"),
    ]
    assert cli.main(args) == 7
    # without --selfcheck-strict the same report exits 0
    args.remove("--selfcheck-strict")
    assert cli.main(args) == 0
