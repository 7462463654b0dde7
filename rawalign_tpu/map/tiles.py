"""Host-side DTW tile preparation: swap/pad/bucket + device dispatch.

The sparse border constraint turns chains into many small (a, b) DTW
problems ("tiles", rmap.cpp:248-293). Tiles are swapped so a is the
longer sequence (dtw.cpp:283-292) and laid out in the band-aligned
pre-shifted format the device kernel consumes (per-tile band offsets
absorbed here so the kernel needs no gathers; see
rawalign_tpu.map.dtw for the layout contract). Each (max_n, dpw) bucket
shape compiles once and is reused.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np

from rawalign_tpu.map import dtw as ddtw


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pow2_at_least(x: int, lo: int) -> int:
    """Smallest power of two >= max(x, lo).

    Compile-shape parameters are quantized to powers of two: the fused
    multi-class dispatch's jit signature contains EVERY class's
    (dpw, max_n, lb2, tp), so each distinct combination is a separate
    multi-second remote compile — pow2 buckets collapse the combination
    space to a handful that stabilizes after the first few batches."""
    p = lo
    while p < x:
        p *= 2
    return p


def _dtw_impl() -> str:
    """'pallas' (default: fused on-chip kernel) or 'scan' (XLA scan)."""
    return os.environ.get("RAWALIGN_TPU_DTW_IMPL", "pallas")


@dataclasses.dataclass
class TileBatch:
    a2: np.ndarray  # (T, max_n + dpw) pre-shifted longer sequences
    b2: np.ndarray  # (T, LB2) pre-shifted shorter sequences
    a_len: np.ndarray
    b_len: np.ndarray
    radius: np.ndarray
    exclude_last: np.ndarray
    a_last: np.ndarray
    b_last: np.ndarray
    d00: np.ndarray
    dpw: int
    max_n: int

    @property
    def n_tiles(self) -> int:
        return self.a2.shape[0]


def prepare_tiles(
    pairs: list[tuple[np.ndarray, np.ndarray, int, bool]],
    *,
    lane_align: int = 8,
) -> TileBatch:
    """pairs: (read_region, ref_region, band_radius, exclude_last).

    Swaps each pair so a is the longer sequence; the band radius is
    computed by the caller from the READ region length before swapping
    (rmap.cpp:276).
    """
    T = len(pairs)
    sizes_r = np.fromiter((p[0].size for p in pairs), np.int64, T)
    sizes_f = np.fromiter((p[1].size for p in pairs), np.int64, T)
    swap = sizes_f > sizes_r
    a_len = np.where(swap, sizes_f, sizes_r).astype(np.int32)
    b_len = np.where(swap, sizes_r, sizes_f).astype(np.int32)
    radius = np.fromiter((p[2] for p in pairs), np.int32, T)
    excl = np.fromiter((p[3] for p in pairs), bool, T)

    n64 = np.maximum(a_len.astype(np.int64), 1)
    m64 = b_len.astype(np.int64)
    r64 = radius.astype(np.int64)
    R = r64 + ((n64 - m64) * r64 + n64 - 1) // n64
    lp = R + np.where(R % 2 == 0, 1, 0)
    half_lp = (lp // 2).astype(np.int64)

    # pow2 shape buckets keep the set of compiled kernel variants small
    # AND stable: the fused multi-class dispatch bakes every class's
    # (dpw, max_n, lb2, T) into one jit signature, so each distinct
    # combination is a separate multi-second remote compile
    dpw = _pow2_at_least(int(R.max(initial=1)) + 3, 16)
    max_n = _pow2_at_least(int(a_len.max(initial=1)), 32)
    lb2 = _pow2_at_least(int((m64 + half_lp + 1 + dpw).max(initial=1)), 32)

    # flat value pools + one vectorized scatter per panel (a Python loop
    # over tens of thousands of tiny tiles dominated mapping wall time)
    a_flat = (
        np.concatenate(
            [np.asarray(p[1] if sw else p[0], np.float32) for p, sw in zip(pairs, swap)]
        )
        if T
        else np.zeros(0, np.float32)
    )
    b_flat = (
        np.concatenate(
            [np.asarray(p[0] if sw else p[1], np.float32) for p, sw in zip(pairs, swap)]
        )
        if T
        else np.zeros(0, np.float32)
    )
    al64 = a_len.astype(np.int64)
    bl64 = b_len.astype(np.int64)
    a_starts = np.concatenate([[0], np.cumsum(al64)[:-1]])
    b_starts = np.concatenate([[0], np.cumsum(bl64)[:-1]])
    rows_a = np.repeat(np.arange(T, dtype=np.int64), al64)
    intra_a = np.arange(a_flat.size, dtype=np.int64) - np.repeat(a_starts, al64)
    rows_b = np.repeat(np.arange(T, dtype=np.int64), bl64)
    intra_b = np.arange(b_flat.size, dtype=np.int64) - np.repeat(b_starts, bl64)

    a2 = np.zeros((T, max_n + dpw), dtype=np.float32)
    b2 = np.zeros((T, lb2), dtype=np.float32)
    # A2[t, x] = a[t, x - (dpw-1) + half_lp[t]]; offsets always in-range
    # by construction (dpw >= R+3 > half_lp; widths sized to fit)
    off_a = (dpw - 1) - half_lp
    a2[rows_a, np.repeat(off_a, al64) + intra_a] = a_flat
    # B2[t, x] = b[t, x - half_lp[t] - 1]
    b2[rows_b, np.repeat(half_lp + 1, bl64) + intra_b] = b_flat

    a_last = np.zeros(T, dtype=np.float32)
    b_last = np.zeros(T, dtype=np.float32)
    d00 = np.zeros(T, dtype=np.float32)
    ok = (al64 > 0) & (bl64 > 0)
    if T and a_flat.size and b_flat.size:
        a_first = np.where(ok, a_flat[np.minimum(a_starts, a_flat.size - 1)], 0)
        b_first = np.where(ok, b_flat[np.minimum(b_starts, b_flat.size - 1)], 0)
        a_last = np.where(
            ok, a_flat[np.minimum(a_starts + al64 - 1, a_flat.size - 1)], 0
        ).astype(np.float32)
        b_last = np.where(
            ok, b_flat[np.minimum(b_starts + bl64 - 1, b_flat.size - 1)], 0
        ).astype(np.float32)
        d00 = np.abs(a_first - b_first).astype(np.float32)
        d00[~ok] = 0.0
    return TileBatch(
        a2=a2,
        b2=b2,
        a_len=a_len,
        b_len=b_len,
        radius=radius,
        exclude_last=excl,
        a_last=a_last,
        b_last=b_last,
        d00=d00,
        dpw=dpw,
        max_n=max_n,
    )


@dataclasses.dataclass
class PendingDtw:
    n: int
    small_idx: list
    small_pending: list  # (s0, len, device_array)
    large_idx: list
    large_costs: np.ndarray
    packed: object = None  # single device array (indexed dispatch)
    packed_chunks: tuple = ()  # (s0, len, offset) into packed


def dtw_submit(
    pairs: list[tuple[np.ndarray, np.ndarray, int, bool]],
    *,
    device_max_n: int = 128,
    device_max_b: int = 128,
    memory_budget_bytes: int = 1 << 30,
) -> PendingDtw:
    """Size-bucketed batched DTW over raw tile pairs: dispatch phase.

    Small tiles (the overwhelming majority under the sparse border
    constraint) are dispatched to the device kernel asynchronously,
    T-chunked to keep the one-hot extraction tensor under the memory
    budget. Oversized tiles (rare long chain parts / global-mode
    alignments) run on the native C implementation of the same exact band
    geometry while the device chunks are in flight (numpy golden if the
    native library is unavailable). Collect results with dtw_collect."""
    small_idx: list[int] = []
    large_idx: list[int] = []
    for i, (ra, rb, _, _) in enumerate(pairs):
        if max(ra.size, rb.size) <= device_max_n and min(
            ra.size, rb.size
        ) <= device_max_b:
            small_idx.append(i)
        else:
            large_idx.append(i)
    small_pending = []
    if small_idx:
        # sub-bucket by pow2 size class so mixed batches do not all pad
        # to the global maximum (and so the set of compiled kernel
        # shapes stays small and stable)
        by_class: dict[tuple, list[int]] = {}
        for pos, i in enumerate(small_idx):
            n = max(pairs[i][0].size, pairs[i][1].size)
            m = min(pairs[i][0].size, pairs[i][1].size)
            r = pairs[i][2]
            n1 = max(n, 1)
            R = r + ((n1 - m) * r + n1 - 1) // n1
            c = (_pow2_at_least(n, 32), R % 2 == 0)
            by_class.setdefault(c, []).append(pos)
        order: list[int] = []
        for c in sorted(by_class):
            order.extend(by_class[c])
        # reorder small_idx so results map back positionally
        small_idx = [small_idx[p] for p in order]
        sub = [pairs[i] for i in small_idx]
        chunk_descs: list[tuple[int, list]] = []
        s0 = 0
        for c in sorted(by_class):
            cnt = len(by_class[c])
            csz = c[0]
            per_tile = csz * 4 * csz * 4  # rough upper bound, panel bytes
            t_cap = max(256, memory_budget_bytes // max(per_tile, 1))
            for off in range(0, cnt, t_cap):
                chunk = sub[s0 + off : s0 + off + min(t_cap, cnt - off)]
                chunk_descs.append((s0 + off, chunk, bool(c[1])))
            s0 += cnt
        if _dtw_impl() == "pallas":
            # ONE jit dispatch for all class batches: per-call dispatch
            # over the tunneled device costs ~1 ms, more than the device
            # time of an entire class batch
            import jax

            from rawalign_tpu.map import dtw_pallas

            flat: list[np.ndarray] = []
            metas: list[tuple] = []
            corrs: list[np.ndarray] = []
            for _, chunk, plm_flag in chunk_descs:
                batch = prepare_tiles(chunk)
                args, corr = pallas_inputs(batch)
                flat.extend(args)
                metas.append((batch.dpw, batch.max_n, plm_flag))
                corrs.append(corr)
            outs = dtw_pallas.dtw_banded_multi(
                tuple(flat),
                metas=tuple(metas),
                interpret=jax.default_backend() == "cpu",
            )
            small_pending = [
                (s0c, len(chunk), _PendingPallas(outs[k], corrs[k]))
                for k, (s0c, chunk, _plm) in enumerate(chunk_descs)
            ]
        else:
            small_pending = [
                (s0c, len(chunk), dtw_banded_async(prepare_tiles(chunk)))
                for s0c, chunk, _plm in chunk_descs
            ]
    large_costs = np.zeros(0, np.float32)
    if large_idx:
        # run the native large-tile batch on a worker thread so it
        # overlaps the in-flight device chunks (joined in dtw_collect)
        import concurrent.futures

        sub = [pairs[i] for i in large_idx]

        def _run_large():
            from rawalign_tpu import native

            if native.available():
                return native.dtw_banded_batch(sub)
            from rawalign_tpu.golden import dtw as gdtw

            return np.array(
                [
                    gdtw.dtw_global_slantedbanded_antidiagonalwise(a, b, r, x)
                    for a, b, r, x in sub
                ],
                dtype=np.float32,
            )

        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        large_costs = pool.submit(_run_large)
        pool.shutdown(wait=False)
    return PendingDtw(
        n=len(pairs),
        small_idx=small_idx,
        small_pending=small_pending,
        large_idx=large_idx,
        large_costs=large_costs,
    )


def _desc_array(
    a_base, a_len, b_base, b_len, radius, excl, *, dpw: int, tg: int = 128
) -> np.ndarray:
    """Build the (9, Tp) int32 descriptor array for one class batch.
    Rows: a_base, off_a, n, b_base, off_b, m, lp, ls, excl. Pads the tile
    axis to a power-of-two multiple of the lane group with 1x1 dummy
    tiles so compiled shapes stay few and stable."""
    T = a_base.size
    Tp = tg
    while Tp < T:
        Tp *= 2
    n64 = np.maximum(a_len.astype(np.int64), 1)
    m64 = b_len.astype(np.int64)
    r64 = radius.astype(np.int64)
    R = r64 + ((n64 - m64) * r64 + n64 - 1) // n64  # dtw.cpp:294-300
    lp = R + np.where(R % 2 == 0, 1, 0)
    ls = R + np.where(R % 2 == 1, 1, 0)
    half_lp = lp // 2
    d = np.zeros((9, Tp), dtype=np.int32)
    d[0, :T] = a_base
    d[1, :T] = (dpw - 1) - half_lp
    d[2, :T] = a_len
    d[3, :T] = b_base
    d[4, :T] = half_lp + 1
    d[5, :T] = b_len
    d[6, :T] = lp
    d[7, :T] = ls
    d[8, :T] = excl
    if Tp > T:  # dummy 1x1 tiles, radius 1 -> R=1, lp=1, ls=2
        d[1, T:] = dpw - 1
        d[2, T:] = 1
        d[4, T:] = 1
        d[5, T:] = 1
        d[6, T:] = 1
        d[7, T:] = 2
    return d


def dtw_submit_indexed(
    a_base: np.ndarray,
    a_len: np.ndarray,
    b_base: np.ndarray,
    b_len: np.ndarray,
    radius: np.ndarray,
    excl: np.ndarray,
    ref_cat_dev,
    ev_cat: np.ndarray,
    ref_cat_host: np.ndarray,
    *,
    device_max_n: int = 128,
    device_max_b: int = 128,
    mesh=None,
    tg: int = 128,
    ev_dev=None,
    ev_fetch=None,
) -> PendingDtw:
    """Descriptor-based batched DTW dispatch: the a side must already be
    the longer sequence; bases index the combined [ref_cat | ev_cat] pool
    (event bases pre-offset by len(ref_cat)). Only descriptors (~36 B per
    tile) and the round's event pool cross the host->device link; panels
    are gathered on device from the resident reference pool
    (dtw_pallas._panels_from_descs).

    With ``mesh`` set, every class batch's tile axis is padded to a
    multiple of (mesh.size * tg) and sharded over ALL mesh devices
    (dtw_pallas.dtw_banded_multi_indexed_sharded); ref_cat_dev must then
    be replicated over the mesh."""
    import jax

    N = a_base.size
    small = (a_len <= device_max_n) & (b_len <= device_max_b)
    small_idx = np.nonzero(small)[0]
    large_idx = np.nonzero(~small)[0]
    packed = None
    packed_chunks: list = []
    small_pending: list = []
    if small_idx.size:
        from rawalign_tpu.map import dtw_pallas

        tg_total = tg * (mesh.size if mesh is not None else 1)
        # pow2 size classes (32, 64, ..., pow2>=device_max_n): derived
        # from device_max_n so a larger device cap cannot silently
        # truncate tiles into a smaller class (see _pow2_at_least)
        cls = np.full(small_idx.size, 32, np.int64)
        p = 64
        top = _pow2_at_least(device_max_n, 32)
        while p <= top:
            cls[a_len[small_idx] > p // 2] = p
            p *= 2
        # sub-split every size class by R parity: plm (= R even) is a
        # per-tile constant of the wavefront recurrence, so
        # parity-uniform batches compile a kernel with the ~8
        # plm-selects per iteration folded away (plm_static)
        n64_all = np.maximum(a_len[small_idx].astype(np.int64), 1)
        r_all = radius[small_idx].astype(np.int64)
        R_all = r_all + (
            (n64_all - b_len[small_idx].astype(np.int64)) * r_all
            + n64_all - 1
        ) // n64_all
        parity = (R_all % 2 == 0).astype(np.int64)
        key = cls * 2 + parity
        order = np.argsort(key, kind="stable")
        small_idx = small_idx[order]
        cls = cls[order]
        key = key[order]
        parity = parity[order]
        bounds = np.nonzero(np.diff(key))[0] + 1
        starts = np.concatenate([[0], bounds])
        ends = np.concatenate([bounds, [small_idx.size]])
        descs = []
        metas = []
        out_off = 0
        for s0, s1 in zip(starts, ends):
            sel = small_idx[s0:s1]
            al, bl, r = a_len[sel], b_len[sel], radius[sel]
            n64 = np.maximum(al.astype(np.int64), 1)
            R = r.astype(np.int64) + (
                (n64 - bl.astype(np.int64)) * r.astype(np.int64) + n64 - 1
            ) // n64
            half_lp = (R + np.where(R % 2 == 0, 1, 0)) // 2
            dpw = _pow2_at_least(int(R.max(initial=1)) + 3, 16)
            max_n = int(cls[s0])
            plm_flag = bool(parity[s0])
            lb2 = _pow2_at_least(
                int((bl.astype(np.int64) + half_lp + 1 + dpw).max(initial=1)),
                32,
            )
            d = _desc_array(
                a_base[sel], al, b_base[sel], bl, r, excl[sel], dpw=dpw,
                tg=tg_total,
            )
            descs.append(d)
            tp = d.shape[1]
            metas.append((dpw, max_n, lb2, tp, plm_flag))
            packed_chunks.append((int(s0), int(s1 - s0), out_off))
            out_off += tp
        Lev = max(256, ev_cat.size)
        Lp = 256
        while Lp < Lev:
            Lp *= 2
        if mesh is not None:
            ev_pool = np.zeros(Lp, dtype=np.float32)
            ev_pool[: ev_cat.size] = ev_cat
            outs = dtw_pallas.dtw_banded_multi_indexed_sharded(
                ref_cat_dev,
                ev_pool,
                tuple(descs),
                metas=tuple(metas),
                mesh=mesh,
                tg=tg,
                interpret=jax.default_backend() == "cpu",
            )
            small_pending = [
                (s0c, lnc, outs[k])
                for k, (s0c, lnc, _off) in enumerate(packed_chunks)
            ]
            packed_chunks = []
        elif ev_dev is not None:
            # device-resident event pool: only descriptors cross the link
            blob = np.zeros(
                sum(9 * m[3] for m in metas), dtype=np.float32
            )
            off = 0
            for d in descs:
                flat = d.reshape(-1)
                blob[off : off + flat.size] = flat.view(np.float32)
                off += flat.size
            packed = dtw_pallas.dtw_banded_multi_indexed(
                ref_cat_dev,
                blob,
                ev_dev,
                metas=tuple(metas),
                lev=0,
                interpret=jax.default_backend() == "cpu",
            )
            packed.copy_to_host_async()
        else:
            blob = np.zeros(
                Lp + sum(9 * m[3] for m in metas), dtype=np.float32
            )
            blob[: ev_cat.size] = ev_cat
            off = Lp
            for d in descs:
                flat = d.reshape(-1)
                blob[off : off + flat.size] = flat.view(np.float32)
                off += flat.size
            packed = dtw_pallas.dtw_banded_multi_indexed(
                ref_cat_dev,
                blob,
                metas=tuple(metas),
                lev=Lp,
                interpret=jax.default_backend() == "cpu",
            )
            # begin the device->host fetch immediately so the link
            # latency overlaps the caller's host work (dtw_collect would
            # otherwise issue the transfer only when it blocks)
            packed.copy_to_host_async()
    large_costs = np.zeros(0, np.float32)
    if large_idx.size:
        Lref = ref_cat_host.size

        def window(base, ln):
            if base < Lref:
                return ref_cat_host[base : base + ln]
            if ev_fetch is not None:  # resident-event mode (rare path)
                return ev_fetch(base - Lref, ln)
            return ev_cat[base - Lref : base - Lref + ln]

        sub = [
            (
                window(int(a_base[i]), int(a_len[i])),
                window(int(b_base[i]), int(b_len[i])),
                int(radius[i]),
                bool(excl[i]),
            )
            for i in large_idx
        ]
        import concurrent.futures

        def _run_large():
            from rawalign_tpu import native

            if native.available():
                return native.dtw_banded_batch(sub)
            from rawalign_tpu.golden import dtw as gdtw

            return np.array(
                [
                    gdtw.dtw_global_slantedbanded_antidiagonalwise(a, b, r, x)
                    for a, b, r, x in sub
                ],
                dtype=np.float32,
            )

        pool = concurrent.futures.ThreadPoolExecutor(max_workers=1)
        large_costs = pool.submit(_run_large)
        pool.shutdown(wait=False)
    return PendingDtw(
        n=N,
        small_idx=list(small_idx),
        small_pending=small_pending,
        large_idx=list(large_idx),
        large_costs=large_costs,
        packed=packed,
        packed_chunks=tuple(packed_chunks),
    )


def dtw_collect(pending: PendingDtw) -> np.ndarray:
    """Block on the device chunks and assemble costs in input order."""
    out = np.zeros(pending.n, dtype=np.float32)
    if pending.small_idx:
        costs = np.zeros(len(pending.small_idx), dtype=np.float32)
        from rawalign_tpu import runtime

        if pending.packed is not None:
            arr = runtime.fetch(pending.packed, label="DTW fetch")
            for s0, ln, off in pending.packed_chunks:
                costs[s0 : s0 + ln] = arr[off : off + ln]
        for s0, ln, dev in pending.small_pending:
            costs[s0 : s0 + ln] = runtime.fetch(dev, label="DTW fetch")[:ln]
        out[pending.small_idx] = costs
    if pending.large_idx:
        lc = pending.large_costs
        if hasattr(lc, "result"):  # concurrent.futures.Future
            lc = lc.result()
        out[pending.large_idx] = lc
    return out


def dtw_banded_pairs(
    pairs: list[tuple[np.ndarray, np.ndarray, int, bool]], **kw
) -> np.ndarray:
    """Synchronous wrapper: submit + collect."""
    if not pairs:
        return np.zeros(0, dtype=np.float32)
    return dtw_collect(dtw_submit(pairs, **kw))


def dtw_banded(batch: TileBatch) -> np.ndarray:
    """Run the batched banded DTW kernel; returns (T,) float32 costs."""
    return np.asarray(dtw_banded_async(batch))[: batch.n_tiles]


class _PendingPallas:
    """Async handle for the fused Pallas DTW kernel: exclude_last is a
    host-side correction applied when the result is materialized."""

    __slots__ = ("dev", "corr")

    def __init__(self, dev, corr: np.ndarray):
        self.dev = dev
        self.corr = corr

    def __array__(self, dtype=None, copy=None):
        out = np.asarray(self.dev) - self.corr
        return out if dtype is None else out.astype(dtype)


def pallas_inputs(batch: TileBatch, tg: int = 128):
    """Build the fused-kernel host layout from a TileBatch.

    Tiles are padded to a multiple of the lane-group size; the longer
    sequence panel is reversed (a2rev[y] = A2[H-1-y]) so the kernel's
    per-iteration anti-diagonal read is one uniform dynamic sublane
    slice; the shorter sequence panel is transposed as-is.

    Returns (args, corr): positional arrays for
    dtw_pallas.dtw_banded_batch_pallas and the per-tile exclude_last
    correction to subtract from the fetched costs.

    The tile axis is padded to a power-of-two multiple of the lane
    group so the set of compiled grids stays small and stable (every
    distinct grid is a separate ~seconds-long remote compile).
    """
    T = batch.n_tiles
    Tp = tg
    while Tp < T:
        Tp *= 2
    pad = Tp - T

    def padt(x, fill=0):
        if pad == 0:
            return x
        shape = (pad,) + x.shape[1:]
        return np.concatenate([x, np.full(shape, fill, x.dtype)], axis=0)

    a2 = padt(batch.a2)
    b2 = padt(batch.b2)
    n = padt(batch.a_len, 1).astype(np.int32)
    m = padt(batch.b_len, 1).astype(np.int32)
    r = padt(batch.radius, 1).astype(np.int32)
    n64 = np.maximum(n.astype(np.int64), 1)
    m64 = m.astype(np.int64)
    r64 = r.astype(np.int64)
    R = r64 + ((n64 - m64) * r64 + n64 - 1) // n64  # dtw.cpp:294-300
    lp = (R + np.where(R % 2 == 0, 1, 0)).astype(np.int32)
    ls = (R + np.where(R % 2 == 1, 1, 0)).astype(np.int32)
    d00 = padt(batch.d00)
    corr = np.where(
        batch.exclude_last,
        np.abs(batch.a_last - batch.b_last).astype(np.float32),
        np.float32(0),
    )
    corr = np.concatenate([corr, np.zeros(pad, np.float32)])
    a2rev = np.ascontiguousarray(a2[:, ::-1].T)
    b2t = np.ascontiguousarray(b2.T)
    args = (
        a2rev,
        b2t,
        n[None, :],
        m[None, :],
        lp[None, :],
        ls[None, :],
        d00[None, :],
    )
    return args, corr


def _dtw_banded_async_pallas(batch: TileBatch, tg: int = 128):
    """Dispatch the fused Pallas kernel (rawalign_tpu.map.dtw_pallas)."""
    import jax

    from rawalign_tpu.map import dtw_pallas

    args, corr = pallas_inputs(batch, tg)
    dev = dtw_pallas.dtw_banded_batch_pallas(
        *args,
        dpw=batch.dpw,
        max_n=batch.max_n,
        tg=tg,
        interpret=jax.default_backend() == "cpu",
    )
    return _PendingPallas(dev, corr)


def dtw_banded_async(batch: TileBatch):
    """Dispatch the kernel and return the (padded) device array without
    blocking. The tile count is padded to a power-of-two bucket (dummy
    1x1 tiles) so repeated calls hit a small set of compiled shapes.
    """
    T = batch.n_tiles
    if T == 0:
        return np.zeros(0, dtype=np.float32)
    if _dtw_impl() == "pallas":
        return _dtw_banded_async_pallas(batch)
    Tp = 16
    while Tp < T:
        Tp *= 2
    pad = Tp - T

    def padt(x, fill=0):
        if pad == 0:
            return x
        shape = (pad,) + x.shape[1:]
        return np.concatenate([x, np.full(shape, fill, x.dtype)], axis=0)

    out = ddtw.dtw_banded_batch(
        padt(batch.a2),
        padt(batch.b2),
        padt(batch.a_len, 1),
        padt(batch.b_len, 1),
        padt(batch.radius, 1),
        padt(batch.exclude_last, False),
        padt(batch.a_last),
        padt(batch.b_last),
        padt(batch.d00),
        dpw=batch.dpw,
        max_n=batch.max_n,
    )
    return out
