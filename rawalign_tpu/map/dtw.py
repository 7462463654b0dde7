"""Batched banded DTW on device (JAX): the framework's flagship kernel.

Computes the reference's production alignment kernel
``DTW_global_slantedbanded_antidiagonalwise`` (dtw.cpp:273-520) for a
BATCH of (a, b) tile pairs at once — the sparse border constraint
(rmap.cpp:238-300) decomposes every chain into many small independent DTW
tiles, which forms the batch axis; tiles from all chains of all reads in
a mapping step are evaluated in one call.

Kernel structure (one lax.scan step == one reference iteration ``it``):

* two carried band buffers (the previous two anti-diagonals), vectorized
  over the band axis (width R+1, padded to a static bucket width) and the
  tile axis;
* per-tile slope state: integer center-row tracking cr(it) (the
  reference's ``next_row*n <= m*it`` stepping, dtw.cpp:350-359) and the
  previous-step increment flag;
* when the center row steps down, a SECONDARY anti-diagonal is evaluated
  first, then the PRIMARY one — both with the reference's exact neighbor
  availability rules (dtw.cpp:361-491); out-of-range band slots hold INF
  (=1e10), which the golden-model equivalence tests proved reproduces the
  C buffers' semantics exactly;
* cells read a/b values through dynamic slices along the anti-diagonal.

Scores match the reference bit-for-bit (same operand triples per cell,
float32 min/add).

Band radii vary per tile (max(1, read_len*frac), rmap.cpp:276); callers
bucket tiles by (band width, length) and invoke one jit specialization
per bucket (see DtwTileBatcher in rawalign_tpu.map.tiles).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

INF = jnp.float32(1e10)


def _widened_radius(n, m, r):
    """r + ceil((n-m)*r/n) (dtw.cpp:294-300); n >= m."""
    return r + ((n - m) * r + n - 1) // n


@functools.partial(jax.jit, static_argnames=("dpw", "max_n"))
def dtw_banded_batch(
    a: jax.Array,  # (T, LA) float32, longer sequence per tile, padded
    a_len: jax.Array,  # (T,) int32
    b: jax.Array,  # (T, LB) float32, shorter sequence per tile, padded
    b_len: jax.Array,  # (T,) int32
    radius: jax.Array,  # (T,) int32 UNwidened band radius (>=1)
    exclude_last: jax.Array,  # (T,) bool
    *,
    dpw: int,  # static band buffer width; must be >= max widened R+1
    max_n: int,  # static scan length; must be >= max a_len
) -> jax.Array:
    """Returns (T,) float32 DTW costs. Tiles must satisfy a_len >= b_len
    (callers swap, as the reference does, dtw.cpp:283-292)."""
    T = a.shape[0]
    n = a_len.astype(jnp.int32)
    m = b_len.astype(jnp.int32)
    r0 = radius.astype(jnp.int32)
    R = r0 + ((n - m) * r0 + n - 1) // n
    lp = R + jnp.where(R % 2 == 0, 1, 0)
    ls = R + jnp.where(R % 2 == 1, 1, 0)
    primary_larger = lp > ls  # == (R even)
    half_lp = lp // 2
    half_ls = ls // 2

    o_idx = jnp.arange(dpw, dtype=jnp.int32)[None, :]  # (1, dpw)

    def diag_values(start_i, start_j):
        """Gather a[start_i - o], b[start_j + o] for o in [0, dpw)."""
        # a indices descend from start_i; b ascend from start_j
        ai = start_i[:, None] - o_idx
        bj = start_j[:, None] + o_idx
        av = jnp.take_along_axis(a, jnp.clip(ai, 0, a.shape[1] - 1), axis=1)
        bv = jnp.take_along_axis(b, jnp.clip(bj, 0, b.shape[1] - 1), axis=1)
        return jnp.abs(av - bv)

    def shift_left(x):
        """y[o] = x[o+1], INF shifted in at the end."""
        return jnp.concatenate([x[:, 1:], jnp.full((T, 1), INF)], axis=1)

    def shift_right(x):
        """y[o] = x[o-1], INF shifted in at the front."""
        return jnp.concatenate([jnp.full((T, 1), INF), x[:, :-1]], axis=1)

    def compute_diag(cost, top, left, topleft, o0, o1):
        cell = jnp.minimum(jnp.minimum(top, left), topleft) + cost
        in_range = (o_idx >= o0[:, None]) & (o_idx < o1[:, None])
        return jnp.where(in_range, cell, INF)

    # iteration 0: only cell (0,0) at slot half_lp (+1 if secondary larger)
    # (dtw.cpp:317-347)
    slot0 = jnp.where(primary_larger, half_lp, half_lp + 1)
    d00 = jnp.abs(a[:, 0] - b[:, 0])
    dp1_init = jnp.full((T, dpw), INF).at[jnp.arange(T), slot0].set(
        jnp.where((n > 0) & (m > 0), d00, INF)
    )
    dp0_init = jnp.full((T, dpw), INF)

    def step(carry, it):
        dp0, dp1, cr, prev_inc, result = carry
        active = it < n
        inc = ((cr + 1) * n <= m * it) & active
        cr_new = jnp.where(inc, cr + 1, cr)

        # ---- secondary anti-diagonal (only when stepping down)
        s_i = it + half_ls - 1
        s_j = cr_new - half_ls
        s_o0 = jnp.maximum(jnp.maximum(0, s_i - n + 1), -s_j)
        s_o1 = jnp.minimum(jnp.minimum(ls, s_i + 1), m - s_j)
        s_cost = diag_values(s_i, s_j)
        is_first = o_idx == 0
        is_last_s = o_idx == (ls - 1)[:, None]
        # primary_larger: top=dp1[o], topleft=dp0[o], left=dp1[o+1]
        # else:          top=first?INF:dp1[o],
        #                topleft=(first&!prev_inc)?INF:dp0[o],
        #                left=last?INF:dp1[o+1]   (dtw.cpp:367-408)
        pl = primary_larger[:, None]
        sec_top = jnp.where(pl | ~is_first, dp1, INF)
        sec_topleft = jnp.where(
            pl | ~(is_first & ~prev_inc[:, None]), dp0, INF
        )
        dp1_l = shift_left(dp1)
        sec_left = jnp.where(pl | ~is_last_s, dp1_l, INF)
        sec = compute_diag(s_cost, sec_top, sec_left, sec_topleft, s_o0, s_o1)

        # effective previous buffers for the primary diagonal
        eff_dp0 = jnp.where(inc[:, None], dp1, dp0)
        eff_dp1 = jnp.where(inc[:, None], sec, dp1)

        # ---- primary anti-diagonal
        p_i = it + half_lp
        p_j = cr_new - half_lp
        p_o0 = jnp.maximum(jnp.maximum(0, p_i - n + 1), -p_j)
        p_o1 = jnp.minimum(jnp.minimum(lp, p_i + 1), m - p_j)
        p_cost = diag_values(p_i, p_j)
        is_last_p = o_idx == (lp - 1)[:, None]
        incb = inc[:, None]
        previncb = prev_inc[:, None]

        eff_dp1_r = shift_right(eff_dp1)  # dp1[o-1]
        eff_dp1_l = shift_left(eff_dp1)  # dp1[o+1]
        eff_dp0_r = shift_right(eff_dp0)  # dp0[o-1]
        eff_dp0_l = shift_left(eff_dp0)  # dp0[o+1]

        # primary_larger cases (dtw.cpp:422-453): writes at slot o
        pl_top = jnp.where(is_first, INF, eff_dp1_r)
        pl_topleft = jnp.where(
            incb, eff_dp0, jnp.where(is_first, INF, eff_dp0_r)
        )
        pl_left = jnp.where(incb, jnp.where(is_last_p, INF, eff_dp1), eff_dp1)
        pri_pl = compute_diag(p_cost, pl_top, pl_left, pl_topleft, p_o0, p_o1)

        # !primary_larger cases (dtw.cpp:455-485): writes at slot o+1,
        # reads dp0/dp1 at o+1-based positions ("+1 simplification"):
        # inc:  top=dp1[o], topleft=dp0[o+1], left=dp1[o+1]
        # !inc: top=first?INF:dp1[o], topleft=(first&!previnc)?INF:dp0[o],
        #       left=dp1[o+1]
        # Writing at slot s=o+1 means: read index o = s-1.
        sp_top = jnp.where(
            incb,
            eff_dp1_r,  # dp1[o] at slot o+1 == dp1 shifted right
            jnp.where(is_first_slotted(o_idx), INF, eff_dp1_r),
        )
        sp_topleft = jnp.where(
            incb,
            eff_dp0,  # dp0[o+1] at slot o+1 == dp0[s]
            jnp.where(
                is_first_slotted(o_idx) & ~previncb, INF, eff_dp0_r
            ),
        )
        sp_left = eff_dp1  # dp1[o+1] at slot o+1 == dp1[s]
        # range in slot space: [o0+1, o1+1)
        pri_sp = compute_diag(
            p_cost_shift_right(p_cost), sp_top, sp_left, sp_topleft,
            p_o0 + 1, p_o1 + 1,
        )

        pri = jnp.where(pl, pri_pl, pri_sp)

        new_dp0 = jnp.where(active[:, None], eff_dp1, dp0)
        new_dp1 = jnp.where(active[:, None], pri, dp1)

        # record result at the last iteration of each tile
        res_slot = jnp.where(primary_larger, half_lp, half_lp + 1)
        tile_res = new_dp1[jnp.arange(T), res_slot]
        result = jnp.where(it == n - 1, tile_res, result)
        return (
            new_dp0,
            new_dp1,
            cr_new,
            jnp.where(active, inc, prev_inc),
            result,
        ), None

    def is_first_slotted(o_slots):
        # slot s corresponds to o = s-1; o==0 <=> s==1
        return o_slots == 1

    def p_cost_shift_right(c):
        return jnp.concatenate([jnp.full((T, 1), INF), c[:, :-1]], axis=1)

    # result for 1x1 tiles (n==1): handled by init (dp1_init holds d00 and
    # the scan never runs iteration >= 1 for them)
    init_result = dp1_init[jnp.arange(T), slot0]
    carry0 = (
        dp0_init,
        dp1_init,
        jnp.zeros(T, jnp.int32),
        jnp.zeros(T, jnp.bool_),
        init_result,
    )
    (dp0, dp1, cr, prev_inc, result), _ = jax.lax.scan(
        step, carry0, jnp.arange(1, max_n, dtype=jnp.int32)
    )

    last = jnp.abs(
        a[jnp.arange(T), jnp.maximum(n - 1, 0)]
        - b[jnp.arange(T), jnp.maximum(m - 1, 0)]
    )
    return jnp.where(exclude_last, result - last, result)
