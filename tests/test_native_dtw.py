"""Native C banded DTW vs golden (oracle-validated) + bucketed dispatch."""

import numpy as np
import pytest

from rawalign_tpu import native
from rawalign_tpu.golden import dtw as gdtw
from rawalign_tpu.map import tiles


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(3))
def test_native_dtw_matches_golden(seed):
    rng = np.random.default_rng(seed)
    for al, bl in [(5, 5), (30, 17), (17, 30), (200, 150), (400, 380), (64, 200)]:
        for r in (1, 3, 10, 40):
            for excl in (False, True):
                a = rng.normal(0, 1, al).astype(np.float32)
                b = rng.normal(0, 1, bl).astype(np.float32)
                want = gdtw.dtw_global_slantedbanded_antidiagonalwise(
                    a, b, r, excl
                )
                got = native.dtw_banded(a, b, r, excl)
                both_huge = got > 1e9 and want > 1e9
                assert both_huge or got == pytest.approx(want, abs=1e-3), (
                    al, bl, r, excl, got, want,
                )


def test_bucketed_dispatch_mixed_sizes():
    rng = np.random.default_rng(1)
    pairs = []
    for _ in range(40):
        al = int(rng.integers(5, 60))
        bl = max(2, int(al * rng.uniform(0.8, 1.2)))
        pairs.append(
            (
                rng.normal(0, 1, al).astype(np.float32),
                rng.normal(0, 1, bl).astype(np.float32),
                max(1, al // 10),
                bool(rng.integers(0, 2)),
            )
        )
    # inject oversized tiles that must route to the host path
    for _ in range(3):
        al = int(rng.integers(300, 600))
        bl = int(al * 0.9)
        pairs.append(
            (
                rng.normal(0, 1, al).astype(np.float32),
                rng.normal(0, 1, bl).astype(np.float32),
                max(1, al // 10),
                True,
            )
        )
    rng.shuffle(pairs)
    got = tiles.dtw_banded_pairs(pairs)
    want = np.array(
        [
            gdtw.dtw_global_slantedbanded_antidiagonalwise(a, b, r, x)
            for a, b, r, x in pairs
        ],
        dtype=np.float32,
    )
    both_huge = (got > 1e9) & (want > 1e9)
    np.testing.assert_allclose(
        got[~both_huge], want[~both_huge], atol=1e-3
    )


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_native_global_tb_matches_golden(monkeypatch):
    """The native traceback (the --dtw-output-cigar hot path,
    rmap.cpp:715-717) must be path-identical to the pure-Python golden
    full-matrix traceback, exclude_last included."""
    monkeypatch.setenv("RAWALIGN_TPU_NATIVE_TB", "0")  # golden baseline
    rng = np.random.default_rng(17)
    for _ in range(25):
        n, m = rng.integers(2, 250, 2)
        a = rng.normal(0, 1, n).astype(np.float32)
        b = rng.normal(0, 1, m).astype(np.float32)
        excl = bool(rng.integers(0, 2))
        want = gdtw.dtw_global_tb(a, b, excl)
        ij, diff, cost = native.dtw_global_tb(a, b)
        assert len(ij) == len(want.alignment) + (1 if excl else 0)
        for k, el in enumerate(want.alignment):
            assert (int(ij[k, 0]), int(ij[k, 1])) == (el.i, el.j)
            assert diff[k] == pytest.approx(el.difference, abs=1e-7)
        # ties on repeated values exercise the diagonal-preference rule
        a = np.repeat(rng.normal(0, 1, 5).astype(np.float32), 4)
        b = np.repeat(a[: rng.integers(2, 20)], 2)
        want = gdtw.dtw_global_tb(a, b)
        ij, diff, cost = native.dtw_global_tb(a, b)
        assert cost == pytest.approx(want.cost, abs=1e-5)
        assert [(int(i), int(j)) for i, j in ij] == [
            (el.i, el.j) for el in want.alignment
        ]


@pytest.mark.skipif(not native.available(), reason="native lib unavailable")
def test_cigar_path_end_to_end():
    """End-to-end --dtw-output-cigar: mapped reads carry an aln: path
    tag (through the native traceback when available)."""
    from rawalign_tpu import config
    from rawalign_tpu.config import MappingFlag
    from rawalign_tpu.index import index as dindex
    from rawalign_tpu.map import engine as dengine
    from rawalign_tpu.testing import synth

    ds = synth.make_dataset(
        seed=31, genome_lengths=[20000], n_reads=4, read_len_bp=(400, 900)
    )
    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    mo.set_flag(MappingFlag.DTW_OUTPUT_CIGAR)
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    eng = dengine.MappingEngine(idx, mo, batch_size=4)
    outs = list(eng.map_reads(iter((r.name, r.signal) for r in ds.reads)))
    for o in outs:
        assert o.mapped
        assert any(t.startswith("aln:") for t in o.tags.split("\t"))
