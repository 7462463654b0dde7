"""Fused Pallas event-detection kernel (TPU).

Replaces the two 4000-step XLA scans of ``signal.events`` (sequential
prefix sums + dual-detector peak state machine, reference revent.c:22-138)
with ONE on-chip loop: XLA's ``lax.scan`` pays ~10 us of dispatch per
step (~100 ms per chunk batch); in-kernel the same step is ~100 vector
ops on (1, 128) vregs (~1-2 ms per 128-read tile).

Semantics are identical to events._peak_scan / events._window_tstat /
events._sequential_prefix_sums (which remain the CPU / interpret-mode
reference): float32 prefix sums accumulated in the C code's sequential
order with the square materialized through a VMEM barrier so Mosaic
cannot contract it into an FMA (single rounding would break parity with
revent.c:30), detector 0 masking detector 1 (revent.c:112-120), and
emission order sample-major / detector-minor.

Outputs per 128-read lane tile:
  * packed peaks (L, 128) int32 — 13-bit fields (pos0+1) | (pos1+1)<<13,
    0 meaning "no peak" (positions < L <= 4095 fit; L is asserted);
  * running prefix sums ps (L, 128) float32 — ps[j] after ingesting
    sample j (i.e. reference ps[j+1]); downstream event means gather
    from this exactly like events.detect_events_batch does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FLT_MAX = np.float32(np.finfo(np.float32).max)
FLT_MIN = np.float32(np.finfo(np.float32).tiny)


def _detector_step(st, cv, i, length, thr, win, ph):
    """One peak-state-machine step for one detector on (128,) lanes.

    Transcribed 1:1 from events._peak_scan's ``step`` body (itself from
    revent.c:77-138); returns (new_state, emit, c2_value, c2_pos).
    """
    # bool state is carried as int32 0/1 masks: Mosaic cannot lower
    # select on 1-bit vectors ("Unsupported target bitwidth")
    masked_to, peak_pos, peak_value, valid_peak = st
    active = (masked_to < i) & (i < length)
    no_peak = peak_pos == -1

    deeper = cv < peak_value
    qualifies = (cv - peak_value) > ph
    c1_value = jnp.where(deeper | qualifies, cv, peak_value)
    c1_pos = jnp.where(qualifies, i, peak_pos)

    upd = cv > peak_value
    c2_value = jnp.where(upd, cv, peak_value)
    c2_pos = jnp.where(upd, i, peak_pos)
    becomes_valid = ((c2_value - cv) > ph) & (c2_value > thr)
    c2_valid = (valid_peak > 0) | becomes_valid
    fire = c2_valid & ((i - c2_pos) > (win // 2))

    value = jnp.where(no_peak, c1_value, jnp.where(fire, cv, c2_value))
    pos = jnp.where(no_peak, c1_pos, jnp.where(fire, -1, c2_pos))
    valid = jnp.where(
        no_peak, valid_peak, (c2_valid & ~fire).astype(jnp.int32)
    )
    emit = jnp.where(active & ~no_peak & fire, c2_pos, -1)

    new_st = (
        masked_to,
        jnp.where(active, pos, peak_pos),
        jnp.where(active, value, peak_value),
        jnp.where(active, valid, valid_peak),
    )
    return new_st, emit, c2_value, c2_pos, active, no_peak


def _tstat(ps_m, ps_c, ps_p, pss_m, pss_c, pss_p, i, length, w, zeros):
    """t-statistic at index i from rolling prefix values (revent.c:34-75,
    same expression order as events._window_tstat)."""
    w32 = np.float32(w)
    sum1 = ps_c - ps_m
    sumsq1 = pss_c - pss_m
    sum2 = ps_p - ps_c
    sumsq2 = pss_p - pss_c
    mean1 = sum1 / w32
    mean2 = sum2 / w32
    var = sumsq1 / w32 - mean1 * mean1 + sumsq2 / w32 - mean2 * mean2
    var = jnp.maximum(var, FLT_MIN)
    t = jnp.abs(mean2 - mean1) / jnp.sqrt(jnp.maximum(var / w32, FLT_MIN))
    ok = (i >= w) & (i <= length - w) & (length >= 2 * w)
    # `zeros` is a concrete (non-replicated-layout) vector from the
    # caller; a scalar 0.0 here would make Mosaic relayout-fail
    return jnp.where(ok, t, zeros)


def _make_kernel(L, w1, w2, threshold1, threshold2, peak_height, unroll=1):
    ph = np.float32(peak_height)
    thr = (np.float32(threshold1), np.float32(threshold2))
    win = (w1, w2)
    W = 2 * w2 + 1  # rolling prefix-sum buffer depth

    def kernel(sig_ref, len_ref, pos_ref, ps_ref, sq_ref):
        length = len_ref[0]  # (1, 128)
        # The zero init vectors must take a VMEM round trip: constants
        # (and values Mosaic const-folds, like length*0) get a
        # REPLICATED register layout, which cannot be unified with the
        # concrete layout the fori_loop carry produces on the backedge
        # ("Invalid relayout ... replicated in destination").
        sq_ref[:] = jnp.zeros((1, 128), jnp.float32)
        zeros = sq_ref[:]
        zero_i = zeros.astype(jnp.int32)

        def ingest(j, ps_last, pss_last):
            """Sequential-order f32 accumulation of sample j
            (revent.c:22-32). The square takes a VMEM round trip so it
            is rounded separately from the add (no FMA contraction).
            Beyond L the sample reads as 0.0, so the sums saturate
            exactly (x + 0.0 == x for the finite f32 sums here)."""
            x = jnp.where(
                j < L, sig_ref[0, pl.ds(jnp.minimum(j, L - 1), 1), :], zeros
            )
            sq_ref[:] = x * x
            x2 = sq_ref[:]
            return ps_last + x, pss_last + x2

        # prologue: ingest x[0 .. w2-2] so the first step sees ps[i+w2]
        ps_roll = [zeros] * (w2 + 2)  # ps[i-w2 .. i], i == 0
        pss_roll = [zeros] * (w2 + 2)
        for j in range(w2 - 1):
            p, q = ingest(j, ps_roll[-1], pss_roll[-1])
            ps_roll.append(p)
            pss_roll.append(q)
            ps_ref[pl.ds(j, 1), :] = p
        ps_roll = ps_roll[-W + 1 :]
        pss_roll = pss_roll[-W + 1 :]
        # rolling layout during the loop: index k holds ps[i - w2 + k]
        # (k = 0..2*w2), so after the in-loop ingest the list has W
        # entries; here it has W-1 (missing ps[i+w2], added per step).

        def mk_state():
            return (
                zero_i,  # masked_to
                zero_i - 1,  # peak_pos
                zeros + FLT_MAX,  # peak_value
                zero_i,  # valid_peak (0/1 mask)
            )

        def one_step(i, carry):
            rolls, st0, st1, ps_last, pss_last = carry
            ps_list = list(rolls[: W - 1])
            pss_list = list(rolls[W - 1 :])

            j = i + w2 - 1  # sample to ingest
            ps_new, pss_new = ingest(j, ps_last, pss_last)

            @pl.when(j < L)
            def _():
                ps_ref[pl.ds(jnp.minimum(j, L - 1), 1), :] = ps_new

            ps_list.append(ps_new)
            pss_list.append(pss_new)

            cv1 = _tstat(
                ps_list[w2 - w1], ps_list[w2], ps_list[w2 + w1],
                pss_list[w2 - w1], pss_list[w2], pss_list[w2 + w1],
                i, length, w1, zeros,
            )
            cv2 = _tstat(
                ps_list[0], ps_list[w2], ps_list[2 * w2],
                pss_list[0], pss_list[w2], pss_list[2 * w2],
                i, length, w2, zeros,
            )

            st0n, emit0, c2v0, c2p0, active0, no_peak0 = _detector_step(
                st0, cv1, i, length, thr[0], win[0], ph
            )
            # detector 0 dominating detector 1 BEFORE detector 1 steps
            # (revent.c:112-120 via events._peak_scan)
            dominate = active0 & ~no_peak0 & (c2v0 > thr[0])
            m1, p1, v1, q1 = st1
            st1 = (
                jnp.where(dominate, c2p0 + win[0], m1),
                jnp.where(dominate, -1, p1),
                jnp.where(dominate, FLT_MAX, v1),
                jnp.where(dominate, 0, q1),
            )
            st1n, emit1, _, _, _, _ = _detector_step(
                st1, cv2, i, length, thr[1], win[1], ph
            )

            packed = (emit0 + 1) | ((emit1 + 1) << 13)

            @pl.when(i < L)
            def _():
                pos_ref[pl.ds(jnp.minimum(i, L - 1), 1), :] = packed

            new_rolls = tuple(ps_list[1:]) + tuple(pss_list[1:])
            return (new_rolls, st0n, st1n, ps_new, pss_new)

        def body(i0, carry):
            # Unrolled by `unroll`: steps past L are state no-ops (the
            # active/ok predicates all compare against length <= L and
            # the padded signal reads 0.0), so only the stores above
            # need the i < L guard.
            for u in range(unroll):
                carry = one_step(i0 * unroll + u, carry)
            return carry

        init_rolls = tuple(ps_roll) + tuple(pss_roll)
        jax.lax.fori_loop(
            0,
            -(-L // unroll),
            body,
            (init_rolls, mk_state(), mk_state(), ps_roll[-1], pss_roll[-1]),
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=(
        "w1", "w2", "threshold1", "threshold2", "peak_height", "interpret",
        "unroll",
    ),
)
def peak_scan_pallas(
    sig: jax.Array,
    length: jax.Array,
    *,
    w1: int,
    w2: int,
    threshold1: float,
    threshold2: float,
    peak_height: float,
    interpret: bool = False,
    unroll: int = 4,
):
    """Run the fused prefix-sum + t-stat + peak kernel.

    sig: (B, L) float32 zero-padded; length: (B,) int32.
    Returns (peaks_lb2 (B, L, 2) int32 emitted positions (-1 = none),
    ps (B, L+1) float32 prefix sums) — drop-in for the XLA scans.
    """
    B, L = sig.shape
    assert L < (1 << 13), "packed peak encoding assumes L < 8192"
    G = -(-B // 128)
    Bp = G * 128
    sig_p = jnp.zeros((Bp, L), jnp.float32).at[:B].set(sig)
    len_p = jnp.zeros((Bp,), jnp.int32).at[:B].set(length)
    # (G, L, 128): reads in lanes, samples in sublanes
    sig_t = sig_p.reshape(G, 128, L).transpose(0, 2, 1)
    len_t = len_p.reshape(G, 1, 128)

    kernel = _make_kernel(
        L, w1, w2, threshold1, threshold2, peak_height, unroll=unroll
    )
    pos, ps = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, L, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((L, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * L, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * L, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(sig_t, len_t)

    pos = pos.reshape(G, L, 128).transpose(0, 2, 1).reshape(Bp, L)[:B]
    ps_rows = ps.reshape(G, L, 128).transpose(0, 2, 1).reshape(Bp, L)[:B]
    p0 = (pos & 0x1FFF) - 1
    p1 = ((pos >> 13) & 0x1FFF) - 1
    peaks_lb2 = jnp.stack([p0, p1], axis=-1)
    ps_full = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.float32), ps_rows], axis=1
    )
    return peaks_lb2, ps_full
