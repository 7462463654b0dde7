"""Fused Pallas TPU kernel for batched banded DTW (the flagship kernel).

Same math as rawalign_tpu.map.dtw (the reference's production kernel
``DTW_global_slantedbanded_antidiagonalwise``, dtw.cpp:273-520) but as a
single Pallas program that keeps the whole wavefront state on-chip:

* **tiles live in lanes** — each program instance processes TG=128 tiles,
  one per vector lane, so every VPU op is fully occupied (the XLA scan
  version wastes 1-dpw/128 of each lane group);
* **band slots live in sublanes** — the dp0/dp1 rotating anti-diagonal
  buffers are (dpw, TG) VMEM scratch persisted across the sequential
  wavefront grid dimension; the neighbour shifts of the recurrence are
  sublane-axis concats;
* the anti-diagonal values of ``a`` are uniform dynamic sublane slices
  of a host **reversed pre-shifted layout** (per-tile band offsets are
  absorbed into the layout, so one slice offset serves all lanes);
* the anti-diagonal values of ``b`` come from a per-tile **rolling
  window**: the whole pre-shifted b panel sits in VMEM scratch and is
  circularly rolled by one sublane exactly when that tile's band center
  advances (the reference's integer slope stepping, dtw.cpp:350-359,
  computed in-kernel as a Bresenham accumulator — no division, no
  gathers);
* in-band masks are closed-form iota arithmetic per iteration.

The wavefront loop is the innermost ("arbitrary") grid dimension rather
than a fori_loop: Mosaic requires uniform layouts for loop carries, and
grid-step scratch persistence is the supported idiom for exactly this
kind of sequential recurrence.

No precomputed (T, N, dpw) cost tensors, no one-hot matmuls: HBM traffic
is just the two sequence panels per tile. Scores are bit-identical to
the scan kernel (same float32 operand triples per cell).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INF = 1e10  # python float: jnp scalars would be captured tracer consts


def _kernel(
    a_ref,  # (H, TG) f32   a2rev panel: a2rev[y, t] = A2[t, H-1-y]
    b_ref,  # (LB2, TG) f32 b2t panel:   b2t[x, t] = B2[t, x]
    n_ref,  # (1, TG) i32
    m_ref,  # (1, TG) i32
    lp_ref,  # (1, TG) i32  primary anti-diagonal length
    ls_ref,  # (1, TG) i32  secondary anti-diagonal length
    d00_ref,  # (1, TG) f32 |a[0]-b[0]|
    out_ref,  # (1, TG) f32
    dp0_ref,  # scratch (dpw, TG) f32
    dp1_ref,  # scratch (dpw, TG) f32
    bcur_ref,  # scratch (LB2, TG) f32
    acc_ref,  # scratch (1, TG) i32   Bresenham accumulator
    cr_ref,  # scratch (1, TG) i32    band center
    pinc_ref,  # scratch (1, TG) i32  previous-iteration inc flag
    *,
    dpw: int,
    unroll: int = 1,
    plm_static: bool | None = None,
):
    """One grid step = ``unroll`` wavefront iterations.

    The probe in docs/dtw_unroll_probe (round 4) showed the loop is
    grid-step-overhead bound for the production band widths (iteration
    wall nearly constant from dpw=64 to dpw=256), so iterations are
    unrolled in VALUE form: scratch is read once, ``unroll`` iteration
    bodies chain through registers, scratch is written once. The math
    per iteration is identical to the unroll=1 form (pure code motion;
    bit-exactness pinned by the existing device/golden equivalence
    tests)."""
    H = a_ref.shape[0]
    TG = a_ref.shape[1]
    g = pl.program_id(1)
    n = n_ref[0:1, :]
    m = m_ref[0:1, :]
    lp = lp_ref[0:1, :]
    ls = ls_ref[0:1, :]
    half_lp = lp >> 1
    half_ls = ls >> 1
    # True iff R even ("primary larger"). Per-tile CONSTANT for the
    # whole wavefront — when the host buckets tiles by R parity
    # (tiles.py size classes carry it), plm_static folds the ~8
    # plm-selects per iteration away at trace time.
    if plm_static is None:
        plm = lp > ls  # (1, TG) mixed-parity batch
    else:
        plm = jnp.full((1, TG), plm_static, jnp.bool_)
    def sel_plm(a, b):
        if plm_static is None:
            return jnp.where(plm, a, b)
        return a if plm_static else b

    oi = jax.lax.broadcasted_iota(jnp.int32, (dpw, TG), 0)
    slot0 = sel_plm(half_lp, half_lp + 1)
    slot0_oh = oi == slot0

    inf_row = jnp.full((1, TG), INF, jnp.float32)
    zero_row = jnp.zeros((1, TG), jnp.float32)

    is_first = oi == 0
    is_first_s1 = oi == 1
    is_last_s = oi == (ls - 1)
    is_last_p = oi == (lp - 1)

    def shift_left(x):  # out[o] = x[o+1], INF at o = dpw-1
        return jnp.concatenate([x[1:], inf_row], axis=0)

    def shift_right(x):  # out[o] = x[o-1], INF at o = 0
        return jnp.concatenate([inf_row, x[:-1]], axis=0)

    def one_iter(it, st):
        """One wavefront iteration (it >= 1) in value form."""
        dp0, dp1, bcur, acc, cr, pinc, out = st
        previnc = pinc != 0
        active = it < n  # (1, TG)

        # Bresenham band-center stepping: inc iff floor(it*m/n) advanced
        acc2 = acc + m
        incraw = acc2 >= n
        acc = jnp.where(incraw, acc2 - n, acc2)
        incb = incraw & active
        cr = cr + incb.astype(jnp.int32)

        # roll the b window down one sublane where the band advanced
        broll = jnp.concatenate([bcur[1:], bcur[:1]], axis=0)
        bcur = jnp.where(incb, broll, bcur)

        # anti-diagonal operand values
        av_p = a_ref[pl.ds(H - dpw - it, dpw), :]
        av_p_roll = jnp.concatenate([av_p[1:], zero_row], axis=0)
        av_s = sel_plm(av_p_roll, av_p)
        bv_base = bcur[0:dpw]
        bv_p = bcur[1 : dpw + 1]
        bv_s = sel_plm(bv_p, bv_base)
        c_s = jnp.abs(av_s - bv_s)
        cost_p = jnp.abs(av_p - bv_p)

        # closed-form in-band ranges (dtw.cpp:320-345 band geometry)
        s_i = it + half_ls - 1
        s_j = cr - half_ls
        o0s = jnp.maximum(jnp.maximum(0, s_i - n + 1), -s_j)
        o1s = jnp.minimum(jnp.minimum(ls, s_i + 1), m - s_j)
        r_s = (oi >= o0s) & (oi < o1s)
        p_i = it + half_lp
        p_j = cr - half_lp
        o0p = jnp.maximum(jnp.maximum(0, p_i - n + 1), -p_j)
        o1p = jnp.minimum(jnp.minimum(lp, p_i + 1), m - p_j)

        # odd-R tiles write the primary at slot o+1 ("+1 simplification");
        # express the shifted mask via a shifted iota (Mosaic cannot
        # concatenate or select i1 vectors)
        cost_p_s1 = jnp.concatenate([zero_row, cost_p[:-1]], axis=0)
        c_p = sel_plm(cost_p, cost_p_s1)
        oip = sel_plm(oi, oi - 1)  # -1 row is auto out-of-range
        r_pe = (oip >= o0p) & (oip < o1p)

        # ---- secondary anti-diagonal (dtw.cpp:361-414)
        sec_top = (dp1 if plm_static else jnp.where(is_first, INF, dp1)) if plm_static is not None else jnp.where(plm | ~is_first, dp1, INF)
        sec_topleft = (dp0 if plm_static else jnp.where(is_first & ~previnc, INF, dp0)) if plm_static is not None else jnp.where(plm | ~(is_first & ~previnc), dp0, INF)
        sec_left = (shift_left(dp1) if plm_static else jnp.where(is_last_s, INF, shift_left(dp1))) if plm_static is not None else jnp.where(plm | ~is_last_s, shift_left(dp1), INF)
        sec = jnp.minimum(jnp.minimum(sec_top, sec_left), sec_topleft) + c_s
        sec = jnp.where(r_s, sec, INF)

        eff_dp0 = jnp.where(incb, dp1, dp0)
        eff_dp1 = jnp.where(incb, sec, dp1)

        # ---- primary anti-diagonal (dtw.cpp:416-491)
        eff_dp1_r = shift_right(eff_dp1)
        eff_dp0_r = shift_right(eff_dp0)
        pl_top = jnp.where(is_first, INF, eff_dp1_r)
        pl_topleft = jnp.where(
            incb, eff_dp0, jnp.where(is_first, INF, eff_dp0_r)
        )
        pl_left = jnp.where(incb & is_last_p, INF, eff_dp1)
        sp_top = jnp.where(
            incb, eff_dp1_r, jnp.where(is_first_s1, INF, eff_dp1_r)
        )
        sp_topleft = jnp.where(
            incb, eff_dp0, jnp.where(is_first_s1 & ~previnc, INF, eff_dp0_r)
        )
        sp_left = eff_dp1
        top = sel_plm(pl_top, sp_top)
        topleft = sel_plm(pl_topleft, sp_topleft)
        left = sel_plm(pl_left, sp_left)
        pri = jnp.minimum(jnp.minimum(top, left), topleft) + c_p
        pri = jnp.where(r_pe, pri, INF)

        new_dp0 = jnp.where(active, eff_dp1, dp0)
        new_dp1 = jnp.where(active, pri, dp1)

        tile_res = jnp.min(
            jnp.where(slot0_oh, new_dp1, INF), axis=0, keepdims=True
        )
        out = jnp.where(it == n - 1, tile_res, out)
        pinc = jnp.where(active, incraw.astype(jnp.int32), pinc)
        return (new_dp0, new_dp1, bcur, acc, cr, pinc, out)

    def write_state(st):
        dp0, dp1, bcur, acc, cr, pinc, out = st
        dp0_ref[:, :] = dp0
        dp1_ref[:, :] = dp1
        bcur_ref[:, :] = bcur
        acc_ref[:, :] = acc
        cr_ref[:, :] = cr
        pinc_ref[:, :] = pinc
        out_ref[:, :] = out

    @pl.when(g == 0)
    def _first():
        d00 = d00_ref[0:1, :]
        dp1 = jnp.where(slot0_oh & ((n > 0) & (m > 0)), d00, INF)
        dp0 = jnp.full((dpw, TG), INF, jnp.float32)
        st = (
            dp0,
            dp1,
            b_ref[:, :],
            jnp.zeros((1, TG), jnp.int32),
            jnp.zeros((1, TG), jnp.int32),
            jnp.zeros((1, TG), jnp.int32),
            jnp.min(jnp.where(slot0_oh, dp1, INF), axis=0, keepdims=True),
        )
        for sub in range(1, unroll):
            st = one_iter(jnp.int32(sub), st)
        write_state(st)

    @pl.when(g > 0)
    def _rest():
        st = (
            dp0_ref[:, :],
            dp1_ref[:, :],
            bcur_ref[:, :],
            acc_ref[0:1, :],
            cr_ref[0:1, :],
            pinc_ref[0:1, :],
            out_ref[0:1, :],
        )
        it0 = g * unroll
        for sub in range(unroll):
            st = one_iter(it0 + sub, st)
        write_state(st)


def _dtw_call(
    a2rev: jax.Array,  # (H, T) f32, H = max_n + dpw; a2rev[y,t] = A2[t,H-1-y]
    b2t: jax.Array,  # (LB2, T) f32
    n: jax.Array,  # (1, T) i32 true a lengths
    m: jax.Array,  # (1, T) i32 true b lengths
    lp: jax.Array,  # (1, T) i32 primary anti-diagonal lengths
    ls: jax.Array,  # (1, T) i32 secondary anti-diagonal lengths
    d00: jax.Array,  # (1, T) f32 |a[0]-b[0]|
    *,
    dpw: int,
    max_n: int,
    tg: int = 128,
    interpret: bool = False,
    unroll: int | None = None,
    plm_static: bool | None = None,
) -> jax.Array:
    """Returns (T,) float32 DTW band costs (before exclude_last)."""
    H, T = a2rev.shape
    assert H == max_n + dpw and T % tg == 0, (H, max_n, dpw, T, tg)
    lb2 = b2t.shape[0]
    # wavefront unroll: the sequential grid dimension pays ~2 us/step of
    # loop overhead regardless of band width (round-4 probe), so narrow
    # bands run several iterations per grid step; wide bands are
    # compute-bound and unrolling only raises register pressure
    if unroll is None:
        # measured on-chip (interleaved A/B, bit-exact): dpw16 u2 +24%,
        # dpw64 u2 +22%, dpw128 u4 +27% over u1; very wide bands are
        # compute-bound and deep unrolls only raise register pressure
        if dpw <= 64:
            unroll = 2
        elif dpw <= 128:
            unroll = 4
        elif dpw <= 256:
            unroll = 2
        else:
            unroll = 1
        if interpret:
            # interpret mode is the correctness path (CPU tests):
            # unroll=2 still exercises the multi-iteration body at half
            # the emulation cost
            unroll = min(unroll, 2)
    kern = functools.partial(_kernel, dpw=dpw, unroll=unroll,
                             plm_static=plm_static)
    row = lambda shape: pl.BlockSpec(
        shape, lambda i, it: (0, i), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kern,
        grid=(T // tg, -(-max_n // unroll)),
        in_specs=[
            row((H, tg)),
            row((lb2, tg)),
            row((1, tg)),
            row((1, tg)),
            row((1, tg)),
            row((1, tg)),
            row((1, tg)),
        ],
        out_specs=row((1, tg)),
        out_shape=jax.ShapeDtypeStruct((1, T), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((dpw, tg), jnp.float32),
            pltpu.VMEM((dpw, tg), jnp.float32),
            pltpu.VMEM((lb2, tg), jnp.float32),
            pltpu.VMEM((1, tg), jnp.int32),
            pltpu.VMEM((1, tg), jnp.int32),
            pltpu.VMEM((1, tg), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(a2rev, b2t, n, m, lp, ls, d00)
    return out[0]


dtw_banded_batch_pallas = functools.partial(
    jax.jit(
        _dtw_call,
        static_argnames=(
            "dpw", "max_n", "tg", "interpret", "unroll", "plm_static"
        ),
    ),
)


def _panels_from_descs(src, d, *, dpw: int, max_n: int, lb2: int):
    """Build the kernel's pre-shifted panels ON DEVICE from a flat value
    pool ``src`` and per-tile int32 descriptors ``d`` of shape (9, T):
    rows a_base, off_a, n, b_base, off_b, m, lp, ls, excl.

    Replaces the host-built value panels: the tunneled device's uplink
    runs ~84 MB/s with ~30 ms per transfer, so uploading ~12 MB of tile
    panels per mapping round dominated the DTW phase; descriptors are
    ~100 KB and the reference/event value pools are already resident."""
    a_base, off_a, n, b_base, off_b, m, lp, ls, excl = (
        d[i] for i in range(9)
    )
    H = max_n + dpw
    S = src.shape[0]
    ya = (H - 1) - jax.lax.iota(jnp.int32, H)[:, None]  # A2 column index
    rel_a = ya - off_a[None, :]
    aidx = jnp.clip(a_base[None, :] + rel_a, 0, S - 1)
    a2rev = jnp.where(
        (rel_a >= 0) & (rel_a < n[None, :]), jnp.take(src, aidx, axis=0), 0.0
    )
    xb = jax.lax.iota(jnp.int32, lb2)[:, None]
    rel_b = xb - off_b[None, :]
    bidx = jnp.clip(b_base[None, :] + rel_b, 0, S - 1)
    b2t = jnp.where(
        (rel_b >= 0) & (rel_b < m[None, :]), jnp.take(src, bidx, axis=0), 0.0
    )
    ok = (n > 0) & (m > 0)
    d00 = jnp.where(
        ok,
        jnp.abs(
            jnp.take(src, jnp.clip(a_base, 0, S - 1))
            - jnp.take(src, jnp.clip(b_base, 0, S - 1))
        ),
        0.0,
    )
    corr = jnp.where(
        (excl != 0) & ok,
        jnp.abs(
            jnp.take(src, jnp.clip(a_base + n - 1, 0, S - 1))
            - jnp.take(src, jnp.clip(b_base + m - 1, 0, S - 1))
        ),
        0.0,
    )
    args = (
        a2rev,
        b2t,
        n[None, :],
        m[None, :],
        lp[None, :],
        ls[None, :],
        d00[None, :].astype(jnp.float32),
    )
    return args, corr.astype(jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("metas", "lev", "tg", "interpret")
)
def dtw_banded_multi_indexed(
    ref_cat: jax.Array,  # (Lref,) f32 resident reference value pool
    blob: jax.Array,  # (lev + 9*sum(Tp),) f32: [event pool | bitcast descs]
    ev: jax.Array | None = None,  # resident event pool (then lev == 0)
    *,
    metas: tuple,  # ((dpw, max_n, lb2, Tp), ...) per class batch
    lev: int,
    tg: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Indexed variant of dtw_banded_multi: ONE dispatch per round, ONE
    host->device transfer (the round's event pool and the per-tile int32
    descriptors bitcast into a single f32 blob) and ONE device->host
    result array (all class batches' costs concatenated) — the tunneled
    device runtime serializes transfers at ~30-190 ms each regardless of
    size. Panels are gathered device-side from [ref_cat | event pool]
    (event bases pre-offset by len(ref_cat) on the host); the
    exclude_last correction is applied on device.

    With ``ev`` (a DEVICE-RESIDENT event pool, e.g. the engine's event
    history buffer) the round's event values never cross the link at
    all: blob carries only the descriptors (lev must be 0) and event
    bases index [ref_cat | ev.ravel()]."""
    if ev is not None:
        assert lev == 0
        src = jnp.concatenate([ref_cat, ev.reshape(-1)])
    else:
        src = jnp.concatenate([ref_cat, blob[:lev]])
    ints = jax.lax.bitcast_convert_type(blob[lev:], jnp.int32)
    outs = []
    off = 0
    for meta in metas:
        dpw, max_n, lb2, tp = meta[:4]
        plm = meta[4] if len(meta) > 4 else None
        d = jax.lax.dynamic_slice_in_dim(ints, off, 9 * tp).reshape(9, tp)
        off += 9 * tp
        args, corr = _panels_from_descs(
            src, d, dpw=dpw, max_n=max_n, lb2=lb2
        )
        cost = _dtw_call(
            *args, dpw=dpw, max_n=max_n, tg=tg, interpret=interpret,
            plm_static=plm,
        )
        outs.append(cost - corr)
    return jnp.concatenate(outs)


_SHARDED_DISPATCH_CACHE: dict = {}


def dtw_banded_multi_indexed_sharded(
    ref_cat: jax.Array,  # replicated resident reference value pool
    ev_pool: jax.Array,  # (lev,) f32 round event pool (replicated)
    descs: tuple,  # per class batch: (9, Tp) int32, Tp % (n_dev*tg) == 0
    *,
    metas: tuple,  # ((dpw, max_n, lb2, Tp), ...) — Tp GLOBAL per class
    mesh,
    tg: int = 128,
    interpret: bool = False,
) -> tuple:
    """Mesh-sharded variant of dtw_banded_multi_indexed: the TILE axis of
    every class batch is sharded over all mesh devices (the flattened
    (data, shard) axes); the signal pool is replicated, so each device
    gathers its own panels and runs the wavefront kernel on its tile
    slice with zero inter-device communication — DTW tiles are
    embarrassingly parallel, the multi-chip analog of the reference
    mapping threads each running DTW_global_slantedbanded_antidiagonalwise
    (kt_for, rmap.cpp:916 + dtw.cpp:273-520).

    Returns a tuple of (Tp,) global cost arrays, one per class batch."""
    from jax.sharding import PartitionSpec as P

    axes = tuple(mesh.axis_names)
    key = (mesh, metas, tg, interpret)
    f = _SHARDED_DISPATCH_CACHE.get(key)
    if f is None:

        def local(ref_cat, ev_pool, *dd):
            src = jnp.concatenate([ref_cat, ev_pool])
            outs = []
            for d, meta in zip(dd, metas):
                dpw, max_n, lb2, _tp = meta[:4]
                plm = meta[4] if len(meta) > 4 else None
                args, corr = _panels_from_descs(
                    src, d, dpw=dpw, max_n=max_n, lb2=lb2
                )
                outs.append(
                    _dtw_call(
                        *args,
                        dpw=dpw,
                        max_n=max_n,
                        tg=tg,
                        interpret=interpret,
                        plm_static=plm,
                    )
                    - corr
                )
            return tuple(outs)

        f = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(None), P(None))
                + tuple(P(None, axes) for _ in metas),
                out_specs=tuple(P(axes) for _ in metas),
                check_vma=False,
            )
        )
        _SHARDED_DISPATCH_CACHE[key] = f
    return f(ref_cat, ev_pool, *descs)


@functools.partial(jax.jit, static_argnames=("metas", "tg", "interpret"))
def dtw_banded_multi(
    flat_args: tuple,  # 7 arrays per class batch, concatenated
    *,
    metas: tuple,  # ((dpw, max_n), ...) per class batch
    tg: int = 128,
    interpret: bool = False,
) -> tuple:
    """Run the fused kernel for several shape-class batches in ONE jit
    dispatch. Per-call dispatch over the tunneled device costs ~1 ms —
    more than the device time of a whole class batch — so a mapping
    round submits all its class batches through this single entry."""
    outs = []
    i = 0
    for meta in metas:
        dpw, max_n = meta[:2]
        plm = meta[2] if len(meta) > 2 else None
        outs.append(
            _dtw_call(
                *flat_args[i : i + 7],
                dpw=dpw,
                max_n=max_n,
                tg=tg,
                interpret=interpret,
                plm_static=plm,
            )
        )
        i += 7
    return tuple(outs)
