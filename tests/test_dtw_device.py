"""Device banded DTW kernel vs the golden model / reference oracle."""

import numpy as np
import pytest

from rawalign_tpu.golden import dtw as gdtw
from rawalign_tpu.map import tiles


def _rand(rng, n):
    return rng.normal(0.0, 1.0, size=n).astype(np.float32)


SHAPES = [
    (1, 1),
    (4, 4),
    (10, 7),
    (7, 10),
    (30, 30),
    (30, 17),
    (17, 30),
    (64, 40),
    (40, 64),
    (200, 30),
    (30, 200),
    (128, 128),
    (200, 190),
]


@pytest.mark.parametrize("seed", range(4))
def test_device_banded_matches_golden(seed):
    rng = np.random.default_rng(seed)
    pairs = []
    want = []
    for al, bl in SHAPES:
        for r in (1, 2, 5, 12):
            for excl in (False, True):
                if excl and al == 1 and bl == 1:
                    continue
                a, b = _rand(rng, al), _rand(rng, bl)
                pairs.append((a, b, r, excl))
                want.append(
                    gdtw.dtw_global_slantedbanded_antidiagonalwise(a, b, r, excl)
                )
    batch = tiles.prepare_tiles(pairs)
    got = tiles.dtw_banded(batch)
    want = np.asarray(want, dtype=np.float32)
    # identical operand triples -> must agree to float32 exactness;
    # allow 1e-3 (the reference's own check_dtw tolerance) for safety
    mism = np.abs(got - want)
    # treat both-huge (band missed the corner) as equal
    both_huge = (got > 1e9) & (want > 1e9)
    bad = np.nonzero(~both_huge & (mism > 1e-3))[0]
    assert bad.size == 0, (
        bad[:5],
        [(pairs[i][0].size, pairs[i][1].size, pairs[i][2], pairs[i][3]) for i in bad[:5]],
        got[bad[:5]],
        want[bad[:5]],
    )


def test_device_banded_production_band_fracs():
    """Radii as the mapper computes them: max(1, read_len * 0.10)."""
    rng = np.random.default_rng(99)
    pairs, want = [], []
    for al in (20, 45, 80, 150, 400):
        for stretch in (0.7, 1.0, 1.4):
            bl = max(1, int(al * stretch))
            a, b = _rand(rng, al), _rand(rng, bl)
            r = max(1, int(al * 0.10))
            pairs.append((a, b, r, True))
            want.append(
                gdtw.dtw_global_slantedbanded_antidiagonalwise(a, b, r, True)
            )
    got = tiles.dtw_banded(tiles.prepare_tiles(pairs))
    np.testing.assert_allclose(got, np.asarray(want), atol=1e-3)


def test_indexed_dispatch_matches_golden():
    """dtw_submit_indexed (descriptor form, device-side panel gather)
    must match the golden banded DTW on random tiles drawn from two
    value pools, mixing ref-side-longer and read-side-longer tiles."""
    rng = np.random.default_rng(123)
    ref_cat = _rand(rng, 5000)
    ev_cat = _rand(rng, 800)
    import jax

    ref_dev = jax.device_put(ref_cat)
    Lref = ref_cat.size
    rows, want = [], []
    for _ in range(60):
        # through the 256 size class (the kernel is size-unbounded; the
        # 2048 classes are validated on real TPU where compiles are
        # cheap — interpret-mode unrolls the wavefront grid, so CI stays
        # at <=256)
        tl = int(rng.integers(2, 250))
        ql = int(rng.integers(2, 250))
        t0 = int(rng.integers(0, Lref - tl))
        q0 = int(rng.integers(0, ev_cat.size - ql))
        r = max(1, int(ql * 0.10))
        excl = bool(rng.integers(0, 2))
        ref_r = ref_cat[t0 : t0 + tl]
        read_r = ev_cat[q0 : q0 + ql]
        if tl > ql:
            rows.append((t0, tl, Lref + q0, ql, r, int(excl)))
            want.append(
                gdtw.dtw_global_slantedbanded_antidiagonalwise(
                    ref_r, read_r, r, excl
                )
            )
        else:
            rows.append((Lref + q0, ql, t0, tl, r, int(excl)))
            want.append(
                gdtw.dtw_global_slantedbanded_antidiagonalwise(
                    read_r, ref_r, r, excl
                )
            )
    da = np.asarray(rows, dtype=np.int64)
    pending = tiles.dtw_submit_indexed(
        da[:, 0].astype(np.int32),
        da[:, 1].astype(np.int32),
        da[:, 2].astype(np.int32),
        da[:, 3].astype(np.int32),
        da[:, 4].astype(np.int32),
        da[:, 5].astype(np.int32),
        ref_dev,
        ev_cat,
        ref_cat,
    )
    got = tiles.dtw_collect(pending)
    want = np.asarray(want, dtype=np.float32)
    both_huge = (got > 1e9) & (want > 1e9)
    bad = np.nonzero(~both_huge & (np.abs(got - want) > 1e-3))[0]
    assert bad.size == 0, (bad[:5], got[bad[:5]], want[bad[:5]])
