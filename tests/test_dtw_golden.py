"""Randomized equivalence tests of the golden DTW family against the
actual reference implementation (compiled from /root/reference/src/dtw.cpp
at test time), modeled on the reference's check_dtw harness
(check_dtw.cpp:139-237)."""

import numpy as np
import pytest

from rawalign_tpu.golden import dtw as gdtw
from rawalign_tpu.testing import dtw_oracle

pytestmark = pytest.mark.skipif(
    dtw_oracle.load_oracle() is None, reason="reference DTW oracle unavailable"
)

# shape groups from check_dtw.cpp:183-237
SHAPES = [
    (4, 4),
    (10, 10),
    (30, 30),
    (200, 200),
    (10, 7),
    (30, 17),
    (200, 30),
    (7, 10),
    (17, 30),
    (30, 200),
    (1, 1),
    (1, 9),
    (9, 1),
]


def _rand(rng, n):
    return rng.normal(0.0, 1.0, size=n).astype(np.float32)


@pytest.mark.parametrize("seed", range(8))
def test_score_variants_match_oracle(seed):
    rng = np.random.default_rng(seed)
    for al, bl in SHAPES:
        a, b = _rand(rng, al), _rand(rng, bl)
        for excl in (False, True):
            assert gdtw.dtw_global(a, b, excl) == pytest.approx(
                dtw_oracle.dtw_global(a, b, excl), abs=1e-4
            )
            assert gdtw.dtw_global_slow(a, b, excl) == pytest.approx(
                dtw_oracle.dtw_global_slow(a, b, excl), abs=1e-4
            )
            assert gdtw.dtw_semiglobal(a, b) == pytest.approx(
                dtw_oracle.dtw_semiglobal(a, b), abs=1e-4
            )
            assert gdtw.dtw_semiglobal_slow(a, b, excl) == pytest.approx(
                dtw_oracle.dtw_semiglobal_slow(a, b, excl), abs=1e-4
            )


@pytest.mark.parametrize("seed", range(8))
def test_banded_variants_match_oracle(seed):
    rng = np.random.default_rng(100 + seed)
    for al, bl in SHAPES:
        a, b = _rand(rng, al), _rand(rng, bl)
        for r in (1, 2, 3, 5, 10, max(al, bl)):
            for excl in (False, True):
                got = gdtw.dtw_global_diagonalbanded(a, b, r, excl)
                want = dtw_oracle.dtw_global_diagonalbanded(a, b, r, excl)
                assert got == pytest.approx(want, abs=1e-4), (al, bl, r, excl)
                got = gdtw.dtw_global_slantedbanded(a, b, r, excl)
                want = dtw_oracle.dtw_global_slantedbanded(a, b, r, excl)
                assert got == pytest.approx(want, abs=1e-4), (al, bl, r, excl)
                got = gdtw.dtw_global_slantedbanded_antidiagonalwise(a, b, r, excl)
                want = dtw_oracle.dtw_global_slantedbanded_antidiagonalwise(
                    a, b, r, excl
                )
                assert got == pytest.approx(want, abs=1e-4), (al, bl, r, excl)


@pytest.mark.parametrize("seed", range(4))
def test_traceback_matches_oracle(seed):
    rng = np.random.default_rng(200 + seed)
    for al, bl in SHAPES:
        a, b = _rand(rng, al), _rand(rng, bl)
        for excl in (False, True):
            if excl and al + bl <= 2:
                continue
            res = gdtw.dtw_global_tb(a, b, excl)
            cost, is_, js, diffs = dtw_oracle.dtw_global_tb(a, b, excl)
            assert res.cost == pytest.approx(cost, abs=1e-4)
            assert [e.i for e in res.alignment] == list(is_)
            assert [e.j for e in res.alignment] == list(js)
            np.testing.assert_allclose(
                [e.difference for e in res.alignment], diffs, atol=1e-5
            )
            res = gdtw.dtw_semiglobal_tb(a, b, excl)
            cost, is_, js, diffs = dtw_oracle.dtw_semiglobal_tb(a, b, excl)
            assert res.cost == pytest.approx(cost, abs=1e-4)
            assert [e.i for e in res.alignment] == list(is_)
            assert [e.j for e in res.alignment] == list(js)


def test_banded_equals_full_when_band_covers_path():
    """check_dtw's core property (check_dtw.cpp:128-163): with a radius
    covering the optimal unconstrained path, banded == unbanded."""
    rng = np.random.default_rng(7)
    for al, bl in [(20, 20), (50, 30), (30, 50), (100, 90)]:
        a, b = _rand(rng, al), _rand(rng, bl)
        full = gdtw.dtw_global_slow(a, b)
        res = gdtw.dtw_global_tb(a, b)
        # radius that covers the optimal path, diagonal-band sense
        radius = max(abs(e.j - e.i) for e in res.alignment) + 1
        banded = gdtw.dtw_global_diagonalbanded(a, b, radius)
        assert banded == pytest.approx(full, abs=1e-3)
