"""Fused Pallas TPU kernel for the batched chaining DP.

Same semantics as rawalign_tpu.map.chain.chain_dp_batch (the reference
chaining DP, rmap.cpp:427-507, with the documented bounded predecessor
window) but as one Pallas program:

* **reads live in lanes** (TG=128 per group), **window slots live in
  sublanes** — each anchor step is pure (W, TG) vector work;
* the anchor axis is the sequential innermost grid dimension; per-step
  anchor scores persist in a VMEM scratch panel written one row per
  step and read back as the next steps' predecessor windows;
* input panels are **reversed** (row y = anchor L-1-y) so the window of
  anchor i, ordered by predecessor distance d=1..W, is one uniform
  dynamic sublane slice at row A-i — no gathers, no per-step reversal;
* the reference's serial early-exit semantics (target-gap break, skip
  counter, running-best improvement test) are prefix computations over
  the window axis, implemented as log2(W) Hillis-Steele doubling steps
  (Mosaic has no native cumsum/cummax).

The XLA scan version costs ~50 us per anchor step on this TPU
(dynamic-slice + associative_scan overheads); this kernel replaces the
per-step overhead with ~30 vector ops on (W, TG) registers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rawalign_tpu.map.chain import ChainScores

NEG = -3e38  # python float; jnp consts would be captured tracers
BIG_I = 0x7FFFFFF0


def _kernel(
    seg_ref,  # (L, TG) i32 reversed segment panel
    tgt_ref,  # (L, TG) i32 reversed target-pos panel
    qry_ref,  # (L, TG) i32 reversed query-pos panel
    scores_ref,  # (A, TG) f32 out
    preds_ref,  # (A, TG) i32 out
    f_ref,  # scratch (L, TG) f32 reversed score panel
    *,
    window: int,
    n_anchors: int,
    e: int,
    max_gap: int,
    max_target_gap: int,
    max_skips: int,
):
    W = window
    A = n_anchors
    TG = seg_ref.shape[1]
    i = pl.program_id(1)
    init_score = float(e)

    @pl.when(i == 0)
    def _init():
        f_ref[:, :] = jnp.full(f_ref.shape, NEG, jnp.float32)

    oi = jax.lax.broadcasted_iota(jnp.int32, (W, TG), 0)  # distance-1

    def shift_down(x, d, fill):
        return jnp.concatenate(
            [jnp.full((d, TG), fill, x.dtype), x[:-d]], axis=0
        )

    def prefix_max(x):  # inclusive, in distance order (sublane order)
        d = 1
        while d < W:
            x = jnp.maximum(x, shift_down(x, d, NEG))
            d *= 2
        return x

    def prefix_sum_i32(x):
        d = 1
        while d < W:
            x = x + shift_down(x, d, 0)
            d *= 2
        return x

    # window rows (distance order) and the current anchor's row
    wseg = seg_ref[pl.ds(A - i, W), :]
    wtgt = tgt_ref[pl.ds(A - i, W), :]
    wqry = qry_ref[pl.ds(A - i, W), :]
    wf = f_ref[pl.ds(A - i, W), :]
    cur = A - 1 - i
    cs = seg_ref[pl.ds(cur, 1), :]
    ct = tgt_ref[pl.ds(cur, 1), :]
    cq = qry_ref[pl.ds(cur, 1), :]

    seg_ok = wseg == cs
    cont = seg_ok & ((wqry == cq) | (wtgt == ct))  # rmap.cpp:456-457
    brk_gap = seg_ok & ~cont & (wtgt + max_target_gap < ct)  # :458
    qdiff = cq - wqry
    tdiff = ct - wtgt
    cont2 = seg_ok & ~cont & ~brk_gap & (qdiff < 0)  # :465
    # a gap break stops the reference's loop: every slot at or past the
    # first same-segment break is dead (inclusive prefix-or)
    brk_cum = prefix_sum_i32(brk_gap.astype(jnp.int32)) > 0
    processed = seg_ok & ~cont & ~cont2 & ~brk_cum

    matching = jnp.minimum(jnp.minimum(tdiff, qdiff), e).astype(jnp.float32)
    gap_len = jnp.abs(tdiff - qdiff)
    gap_scale = jnp.where(
        tdiff > 0,
        qdiff.astype(jnp.float32) / tdiff.astype(jnp.float32),
        jnp.float32(1.0),
    )
    gates = (gap_len < max_gap) & (gap_scale < 5.0) & (gap_scale > 0.75)
    cand = jnp.where(gates, wf + matching, 0.0)  # :472-474
    cand_eff = jnp.where(processed, cand, NEG)

    # running best before each slot: max(init, cummax_exclusive(cand))
    cmax_excl = shift_down(prefix_max(cand_eff), 1, NEG)
    running = jnp.maximum(init_score, cmax_excl)
    improved = processed & (cand_eff > running)  # :476

    # skip counter: +1 per processed non-improving slot, -1 per
    # improvement; the loop breaks AFTER a non-improving slot pushes
    # the count past max_skips (rmap.cpp:479-483)
    delta = jnp.where(processed, jnp.where(improved, -1, 1), 0).astype(
        jnp.int32
    )
    skips = prefix_sum_i32(delta)
    skip_brk = (processed & ~improved & (skips > max_skips)).astype(jnp.int32)
    # exclusive: the breaking slot itself was processed
    skip_cut = shift_down(prefix_sum_i32(skip_brk), 1, 0) > 0
    alive = processed & ~skip_cut
    cand_alive = jnp.where(alive, cand_eff, NEG)

    best = jnp.max(cand_alive, axis=0, keepdims=True)  # (1, TG)
    # C's pred = first max in distance order = min distance among maxima
    d_best = jnp.min(
        jnp.where(cand_alive == best, oi + 1, BIG_I), axis=0, keepdims=True
    )
    score_i = jnp.maximum(init_score, best)
    has_pred = best > init_score
    pred_i = jnp.where(has_pred, i - d_best, i)

    f_ref[pl.ds(cur, 1), :] = score_i
    scores_ref[pl.ds(i, 1), :] = score_i
    preds_ref[pl.ds(i, 1), :] = pred_i.astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=(
        "window",
        "e",
        "max_gap",
        "max_target_gap",
        "max_skips",
        "tg",
        "interpret",
    ),
)
def chain_dp_batch_pallas(
    seg: jax.Array,  # (B, A) int32 segment id (target*2+strand), sorted
    target: jax.Array,  # (B, A) int32 target positions
    query: jax.Array,  # (B, A) int32 query positions
    n_anchors: jax.Array,  # (B,) int32
    *,
    window: int = 64,
    e: int = 6,
    max_gap: int = 2000,
    max_target_gap: int = 5000,
    max_skips: int = 25,
    tg: int = 128,
    interpret: bool = False,
) -> ChainScores:
    B, A = seg.shape
    W = window
    Bp = tg * ((B + tg - 1) // tg)

    def panel(x, fill):
        x = x.T  # (A, B)
        x = jnp.concatenate([jnp.full((W, B), fill, x.dtype), x], axis=0)
        if Bp != B:
            x = jnp.concatenate(
                [x, jnp.full((A + W, Bp - B), fill, x.dtype)], axis=1
            )
        return x[::-1]  # reversed: row y = anchor L-1-y

    seg_p = panel(seg, jnp.int32(-1))
    tgt_p = panel(target, jnp.int32(0))
    qry_p = panel(query, jnp.int32(0))
    L = A + W

    kern = functools.partial(
        _kernel,
        window=W,
        n_anchors=A,
        e=e,
        max_gap=max_gap,
        max_target_gap=max_target_gap,
        max_skips=max_skips,
    )
    blk = lambda shape: pl.BlockSpec(
        shape, lambda g, i: (0, g), memory_space=pltpu.VMEM
    )
    scores_t, preds_t = pl.pallas_call(
        kern,
        grid=(Bp // tg, A),
        in_specs=[blk((L, tg)), blk((L, tg)), blk((L, tg))],
        out_specs=(blk((A, tg)), blk((A, tg))),
        out_shape=(
            jax.ShapeDtypeStruct((A, Bp), jnp.float32),
            jax.ShapeDtypeStruct((A, Bp), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((L, tg), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(seg_p, tgt_p, qry_p)
    scores = scores_t[:, :B].T
    preds = preds_t[:, :B].T
    in_range = jnp.arange(A)[None, :] < n_anchors[:, None]
    return ChainScores(
        scores=jnp.where(in_range, scores, 0.0),
        preds=jnp.where(in_range, preds, jnp.arange(A)[None, :]),
    )
