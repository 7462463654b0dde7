"""Device DTW family (map/dtw_family.py) vs the golden model — the
check_dtw-style randomized equivalence suite (check_dtw.cpp:139-237)
for the non-banded/global/semiglobal/diagonal-banded variants, which
completes SURVEY §2 row 12's on-device family."""

import numpy as np
import pytest

from rawalign_tpu.golden import dtw as gdtw
from rawalign_tpu.map import dtw_family

SHAPES = [(4, 4), (8, 6), (30, 17), (17, 30), (64, 80), (120, 100)]


def _batch(rng, N, M, B=12):
    a = np.zeros((B, N), np.float32)
    b = np.zeros((B, M), np.float32)
    na = rng.integers(2, N + 1, B).astype(np.int32)
    nb = rng.integers(2, M + 1, B).astype(np.int32)
    for i in range(B):
        a[i, : na[i]] = rng.normal(0, 1, na[i])
        b[i, : nb[i]] = rng.normal(0, 1, nb[i])
    return a, b, na, nb


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("semiglobal", [False, True])
@pytest.mark.parametrize("exclude", [False, True])
def test_family_matches_golden(shape, semiglobal, exclude):
    rng = np.random.default_rng(shape[0] * 1000 + shape[1])
    a, b, na, nb = _batch(rng, *shape)
    got = np.asarray(
        dtw_family.dtw_batch(
            a, b, na, nb, semiglobal=semiglobal, exclude_last=exclude
        )
    )
    ref = gdtw.dtw_semiglobal_slow if semiglobal else gdtw.dtw_global_slow
    want = np.array(
        [ref(a[i, : na[i]], b[i, : nb[i]], exclude) for i in range(len(na))],
        np.float32,
    )
    # the anti-diagonal wavefront evaluates the exact operand triples of
    # the row-major golden code: bit parity expected, 1e-3 is the
    # reference's own check_dtw tolerance as the backstop
    np.testing.assert_allclose(got, want, atol=1e-3)
    assert (got == want).mean() >= 0.9


@pytest.mark.parametrize("radius", [1, 3, 10, 40])
def test_diagonal_banded_matches_golden(radius):
    rng = np.random.default_rng(radius)
    a, b, na, nb = _batch(rng, 60, 70)
    got = np.asarray(dtw_family.dtw_batch(a, b, na, nb, radius=radius))
    want = np.array(
        [
            gdtw.dtw_global_diagonalbanded(
                a[i, : na[i]], b[i, : nb[i]], radius
            )
            for i in range(len(na))
        ],
        np.float32,
    )
    both_inf = (got > 1e9) & (want > 1e9)
    np.testing.assert_allclose(got[~both_inf], want[~both_inf], atol=1e-3)


def test_semiglobal_agrees_with_full_family_chain():
    """Global cost >= semiglobal cost (free reference-axis ends), and
    band radius large enough reduces to unbanded."""
    rng = np.random.default_rng(99)
    a, b, na, nb = _batch(rng, 40, 50)
    g = np.asarray(dtw_family.dtw_batch(a, b, na, nb))
    s = np.asarray(dtw_family.dtw_batch(a, b, na, nb, semiglobal=True))
    assert (s <= g + 1e-4).all()
    wide = np.asarray(dtw_family.dtw_batch(a, b, na, nb, radius=128))
    np.testing.assert_allclose(wide, g, atol=1e-5)
