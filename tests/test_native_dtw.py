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
