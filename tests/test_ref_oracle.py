"""Event-detection and sketching parity vs the COMPILED reference C
(revent.c, rsketch.c via testing.ref_oracle), the same treatment DTW
already gets from dtw_oracle.py (VERDICT round-1 item 3).

Two tiers:
  * sketch: seed sets must be IDENTICAL (integer math end to end,
    rsketch.c:146-284) on reference-detected events, both modes.
  * events: quantified parity — events are float32 accumulations whose
    peak decisions can flip on 1-ulp t-stat differences
    (revent.c:34-138); we assert the aggregate divergence rate instead
    of pretending bit equality, and exact equality of event VALUES
    whenever the peak sets agree.
"""

import numpy as np
import pytest

from rawalign_tpu.config import MappingOptions
from rawalign_tpu.golden import events as gevents
from rawalign_tpu.golden import sketch as gsketch
from rawalign_tpu.testing import ref_oracle

pytestmark = pytest.mark.skipif(
    ref_oracle.load_oracle() is None,
    reason="reference checkout / C compiler unavailable",
)


def _signals(n, rng):
    """Synthetic pA-scale signal chunks of assorted shapes."""
    out = []
    for _ in range(n):
        ln = int(rng.integers(50, 4000))
        base = rng.normal(95.0, 12.0, ln)
        # step structure so the detector sees event boundaries
        steps = np.repeat(
            rng.normal(0.0, 12.0, ln // 9 + 1), 9
        )[:ln]
        out.append((base + steps).astype(np.float32))
    return out


def test_events_parity_rate():
    rng = np.random.default_rng(123)
    opt = MappingOptions()
    n_total = 0
    n_exact = 0
    n_len_mismatch = 0
    for sig in _signals(60, rng):
        ref = ref_oracle.detect_events(
            sig,
            window_length1=opt.window_length1,
            window_length2=opt.window_length2,
            threshold1=opt.threshold1,
            threshold2=opt.threshold2,
            peak_height=opt.peak_height,
        )
        got = gevents.detect_events(sig, opt)
        n_total += 1
        if ref.size != got.size:
            n_len_mismatch += 1
            continue
        if ref.size == 0 or np.array_equal(ref, got):
            n_exact += 1
    # peak decisions may flip on 1-ulp t-stat differences; the golden
    # model uses sequential-order prefix sums precisely to avoid this,
    # so exactness should be (near-)total
    assert n_exact >= 0.95 * n_total, (n_exact, n_len_mismatch, n_total)
    assert n_len_mismatch <= 0.05 * n_total


def test_sketch_reg_identical_on_ref_events():
    """Seed sets are integer-exact vs the compiled ri_sketch_reg
    (rsketch.c:223-274) on reference-detected events."""
    rng = np.random.default_rng(7)
    n_nonempty = 0
    for sig in _signals(25, rng):
        ev = ref_oracle.detect_events(sig)
        for strand in (0, 1):
            rx, ry = ref_oracle.ri_sketch(
                ev, id=3, strand=strand, w=0, e=6, q=9, lq=3, k=6
            )
            seeds = gsketch.sketch(
                ev, 3, strand, w=0, e=6, n=0, q=9, lq=3, k=6
            )
            gx = np.array([s[0] for s in seeds], dtype=np.uint64)
            gy = np.array([s[1] for s in seeds], dtype=np.uint64)
            assert np.array_equal(rx, gx)
            assert np.array_equal(ry, gy)
            n_nonempty += rx.size > 0
    assert n_nonempty > 0


def test_sketch_min_identical_on_ref_events():
    """Minimizer mode (ri_sketch_min, rsketch.c:146-221) with assorted
    window sizes."""
    rng = np.random.default_rng(11)
    n_nonempty = 0
    for w in (3, 5, 10):
        for sig in _signals(8, rng):
            ev = ref_oracle.detect_events(sig)
            rx, ry = ref_oracle.ri_sketch(
                ev, id=1, strand=0, w=w, e=7, q=9, lq=3, k=6
            )
            seeds = gsketch.sketch(
                ev, 1, 0, w=w, e=7, n=0, q=9, lq=3, k=6
            )
            gx = np.array([s[0] for s in seeds], dtype=np.uint64)
            gy = np.array([s[1] for s in seeds], dtype=np.uint64)
            assert np.array_equal(rx, gx), (w, rx.size, gx.size)
            assert np.array_equal(ry, gy)
            n_nonempty += rx.size > 0
    assert n_nonempty > 0


def test_device_sketch_matches_oracle():
    """The batched device sketch (seeds.sketch) emits the same seed
    hashes/positions as the compiled reference on reference events."""
    import jax.numpy as jnp

    from rawalign_tpu.seeds import sketch as dsketch

    rng = np.random.default_rng(5)
    sigs = _signals(6, rng)
    evs = [ref_oracle.detect_events(s) for s in sigs]
    NE = max(e.size for e in evs)
    batch = np.zeros((len(evs), NE), dtype=np.float32)
    lens = np.zeros(len(evs), dtype=np.int32)
    for i, e in enumerate(evs):
        batch[i, : e.size] = e
        lens[i] = e.size
    out = dsketch.sketch_events_batch(
        jnp.asarray(batch), jnp.asarray(lens), e=6, q=9, lq=3
    )
    hashes = np.asarray(out.hashes)
    qpos = np.asarray(out.qpos)
    valid = np.asarray(out.valid)
    for i, e in enumerate(evs):
        rx, ry = ref_oracle.ri_sketch(e, id=0, strand=0, w=0, e=6, q=9, lq=3, k=6)
        ref_hash = (rx >> np.uint64(gsketch.RI_HASH_SHIFT)).astype(np.uint32)
        ref_pos = (
            (ry & np.uint64(0xFFFFFFFF)) >> np.uint64(gsketch.RI_POS_SHIFT)
        ).astype(np.int32)
        got_hash = hashes[i][valid[i]]
        got_pos = qpos[i][valid[i]]
        assert np.array_equal(np.sort(ref_hash), np.sort(got_hash)), i
        order_r = np.argsort(ref_pos, kind="stable")
        order_g = np.argsort(got_pos, kind="stable")
        assert np.array_equal(ref_hash[order_r], got_hash[order_g])
        assert np.array_equal(ref_pos[order_r], got_pos[order_g])


def test_device_events_match_oracle_rate():
    """Batched device event detection vs compiled reference: same
    aggregate-parity contract as the golden model."""
    import jax.numpy as jnp

    from rawalign_tpu.signal import events as devents

    rng = np.random.default_rng(17)
    opt = MappingOptions()
    sigs = _signals(24, rng)
    L = max(s.size for s in sigs)
    chunks = np.zeros((len(sigs), L), dtype=np.float32)
    lens = np.zeros(len(sigs), dtype=np.int32)
    for i, s in enumerate(sigs):
        chunks[i, : s.size] = s
        lens[i] = s.size
    ev = devents.detect_events_batch(
        jnp.asarray(chunks),
        jnp.asarray(lens),
        w1=opt.window_length1,
        w2=opt.window_length2,
        threshold1=opt.threshold1,
        threshold2=opt.threshold2,
        peak_height=opt.peak_height,
        max_events=4096,
    )
    values = np.asarray(ev.values)
    counts = np.asarray(ev.n_events)
    n_peak_match = 0
    max_val_diff = 0.0
    for i, s in enumerate(sigs):
        ref = ref_oracle.detect_events(
            s,
            window_length1=opt.window_length1,
            window_length2=opt.window_length2,
            threshold1=opt.threshold1,
            threshold2=opt.threshold2,
            peak_height=opt.peak_height,
        )
        got = values[i, : counts[i]]
        if ref.size == got.size:
            n_peak_match += 1
            if ref.size:
                max_val_diff = max(
                    max_val_diff, float(np.abs(ref - got).max())
                )
    # peak DECISIONS must agree (integer outcomes of the t-stat scan);
    # event VALUES carry a bounded f32-normalization error — the device
    # has no f64, so the z-norm runs in float32 (two-pass form); ~6 ulp
    # vs the C double path is the measured envelope
    assert n_peak_match == len(sigs), (n_peak_match, len(sigs))
    assert max_val_diff < 4e-6, max_val_diff
