"""The batched TPU mapping engine.

Replaces the reference's pthread pipeline + per-read chunk loop
(rmap.cpp:667-1052) with continuous batching over fixed-shape device
steps:

  round loop (host):                        device (jitted):
    gather next 1s-chunk of every live read   stage 1: events + seeds +
    <- fetch events + per-seed hit bounds              bucketed index lookup
    expand hits, merge carried anchors,       stage 2: batched banded DTW
    lexsort, pad (batched, map/anchors.py)             (indexed tile panels)
    chaining DP (host C, bit-identical to
      the device kernel — map/chain.py)
    traceback + candidates (host C)
    B&B replay, primary chains, MAPQ,
    early-stop decisions; retire finished
    reads and refill slots from the queue

Reads finish at different chunks; the engine retires them by mask and
keeps the batch full (continuous batching) — the TPU-idiomatic analog of
the reference's per-read early exit (rmap.cpp:685-693).

Division of labor (measured on this environment's tunneled TPU): device
sorts run ~10M elem/s and element gathers ~90M elem/s, so hit-list
expansion and the anchor lexsort live on the host where the REAL data is
tiny (hundreds of anchors/read), and the window-bounded chaining DP (a
few MB of cell updates per round) runs in the native host library when
built — TWO host<->device syncs per chunk round (stage1, DTW),
independent of batch size. With chain_impl="device" the DP runs as its
own sharded device dispatch (three syncs; the distributed engine's
mode).
"""

from __future__ import annotations

import functools
import time
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from rawalign_tpu.config import MappingFlag, MappingOptions
from rawalign_tpu.golden import chain as gchain
from rawalign_tpu.golden import engine as gengine
from rawalign_tpu.index.index import RawIndex
from rawalign_tpu.io import paf
from rawalign_tpu.map import anchors as manchors
from rawalign_tpu.map import chain as dchain
from rawalign_tpu.map import postprocess, stage1_codec, tiles
from rawalign_tpu.seeds import sketch as dsketch
from rawalign_tpu.signal import events as devents


class _ReadState:
    __slots__ = (
        "name",
        "signal",
        "qlen",
        "chunk_ptr",
        "chunks_done",
        "events",
        "offset",
        "ev_total",
        "chains",
        "carried",
        "fin",
        "done",
        "map_time",
    )

    def __init__(self, name: str, signal: np.ndarray):
        self.name = name
        self.signal = np.asarray(signal, dtype=np.float32)
        self.qlen = self.signal.size
        self.chunk_ptr = 0
        self.chunks_done = 0
        self.events = np.zeros(0, dtype=np.float32)
        self.offset = 0
        # total events ever detected for this read (= write offset into
        # the device history row; differs from `offset`, which advances
        # only on chunks that pass the min_events gate)
        self.ev_total = 0
        self.chains: list[gchain.Chain] = []
        # native-finalize state: carried-anchor arrays for the next
        # round's re-injection and the per-read emit-field record —
        # replaces Python Chain objects on the native tail path
        self.carried: tuple | None = None
        self.fin: dict | None = None
        self.done = False
        # accumulated wall time of the mapping rounds this read was live
        # in — the analog of the reference's per-read chunk-loop timer
        # (rmap.cpp:684-694), excluding ingest-queue wait and the other
        # pipeline groups' rounds
        self.map_time = 0.0


class MappingEngine:
    """Maps batches of raw-signal reads against a RawIndex."""

    def __init__(
        self,
        index: RawIndex,
        opt: MappingOptions,
        *,
        batch_size: int = 64,
        max_occ: int = 4096,
        max_anchors: int = 2048,
        max_anchors_ceiling: int | None = None,
        max_carried: int = 1024,
        chain_window: int = 64,
        pipeline_depth: int = 2,
        seeds_out: int = 768,
        dtw_device_max_n: int = 2048,
        dtw_device_max_b: int = 2048,
        fused: bool = False,
        chain_impl: str = "auto",
        stage1_impl: str = "auto",
        mt_mode: str = "share",
    ):
        import concurrent.futures as _cf
        import os as _os

        from rawalign_tpu import runtime

        runtime.enable_compilation_cache()
        # worker pool for the threaded per-round tail (expansion +
        # chain DP + traceback are C with the GIL released — running
        # them off-thread overlaps other pipeline groups' host Python
        # and the device link waits)
        self._pool = _cf.ThreadPoolExecutor(
            max_workers=max(2, min(4, _os.cpu_count() or 2))
        )
        self.index = index
        self.opt = opt
        if mt_mode not in ("share", "wall"):
            raise ValueError(f"mt_mode must be share|wall: {mt_mode}")
        self.mt_mode = mt_mode
        self.batch_size = batch_size
        self.max_occ = max_occ
        # the stage1 (qpos, count) packing cannot represent values
        # beyond these bounds — fail loudly at construction
        stage1_codec.validate_bounds(opt.max_events_per_chunk, max_occ)
        self.max_anchors = max_anchors
        # The reference appends EVERY index hit (rmap.cpp:371-391, occ
        # filter commented out at rmap.cpp:28-51). Fixed shapes are a
        # DEVICE constraint; the host-C chain path has none, so it
        # sizes the per-round anchor arrays dynamically (pow2, floor
        # max_anchors) up to this ceiling and only decimates beyond it.
        # max_occ's default (4096) is sized so the per-seed cap never
        # binds at the evaluated genome scales (5 Mb max key
        # multiplicity: 1738) — VERDICT r3 item 2.
        self.max_anchors_ceiling = (
            max(1 << 17, max_anchors)
            if max_anchors_ceiling is None
            else max(max_anchors_ceiling, max_anchors)
        )
        self.max_carried = max_carried
        self.chain_window = chain_window
        self.pipeline_depth = pipeline_depth
        if stage1_impl not in ("auto", "device", "host", "hybrid"):
            raise ValueError(
                f"stage1_impl must be auto|device|host|hybrid: {stage1_impl}"
            )
        if stage1_impl == "auto":
            # hybrid = host-C event detection (bit-identical to the
            # golden C-double semantics, revent.c:22-188) feeding the
            # device sketch+lookup. Default when the native lib is
            # built: it closes the device f32 event-detector parity gap
            # AND replaces the raw-signal upload with the ~8x smaller
            # event upload while dropping the events kernel from the
            # device stage. `fused=True` needs the signal on device, so
            # it keeps the device detector.
            from rawalign_tpu import native as _nat

            stage1_impl = (
                "hybrid"
                if (_nat.available() and _nat.events_available()
                    and not fused)
                else "device"
            )
        self._stage1_mode = stage1_impl
        self._stage1_host = stage1_impl == "host"
        self._stage1_hybrid = stage1_impl == "hybrid"
        if self._stage1_hybrid and fused:
            raise ValueError("fused=True requires stage1_impl='device'")
        if stage1_impl in ("host", "hybrid"):
            from rawalign_tpu import native as _nat

            if not (_nat.available() and _nat.events_available()):
                raise RuntimeError(
                    f"stage1_impl='{stage1_impl}' requires the native "
                    "host library (make -C native)"
                )
        # tiles with a side beyond these run on the host C fallback; the
        # Pallas wavefront kernel is validated bit-exact through 2048
        # (dtw.cpp:273-520 is size-unbounded; so is the kernel — the cap
        # only bounds VMEM panel shapes). On CPU the kernel runs in
        # interpret mode, whose compile time grows with the unrolled
        # wavefront grid — keep big tiles on the (bit-equivalent) host C
        # there.
        if jax.default_backend() == "cpu":
            dtw_device_max_n = min(dtw_device_max_n, 256)
            dtw_device_max_b = min(dtw_device_max_b, 256)
        self.dtw_device_max_n = dtw_device_max_n
        self.dtw_device_max_b = dtw_device_max_b
        self._keys = jnp.asarray(index.keys)
        self._val_id = jnp.asarray(index.val_id)
        self._val_ps = jnp.asarray(index.val_ps)
        # bucketed unique-key tables: the stage1 lookup costs ~13
        # device gathers per seed instead of 2*log2(S) (index/query.py
        # BucketedKeys — the khash-analog fast path)
        from rawalign_tpu.index import query as dquery

        self._bk = dquery.build_bucketed_keys(np.asarray(index.keys))
        self._signals = index.signals  # host {strand: [per-seq float32]}
        # resident flat reference-signal pool + per-(strand, seq) bases
        # for the indexed DTW dispatch (only tile descriptors cross the
        # host->device link; see tiles.dtw_submit_indexed)
        self._sig_base: dict[tuple[int, int], int] = {}
        parts = []
        off = 0
        for strand in (0, 1):
            for si, sig in enumerate(index.signals[strand]):
                self._sig_base[(strand, si)] = off
                arr = np.asarray(sig, np.float32)
                parts.append(arr)
                off += arr.size
        self._ref_cat_host = (
            np.concatenate(parts) if parts else np.zeros(0, np.float32)
        )
        self._ref_cat_dev = runtime.put(
            self._ref_cat_host, label="reference-signal upload"
        )
        io = index.opt
        ne = opt.max_events_per_chunk
        SENT = np.int32(0x7FFFFFFF)
        self._SENT = SENT
        # Host event copies are kept only when something host-side needs
        # the VALUES (the CIGAR traceback); otherwise events live in a
        # per-slot device history buffer and never cross the link — the
        # tunneled device runtime moves ~45 MB/s, so the per-round event
        # download + DTW event-pool upload (~16 KB/read) dominated.
        # hybrid keeps a free host copy of every event (they originate
        # there), so it never needs events in the stage1 download or the
        # DTW host pool — _events_on_host stays False and CIGAR reads
        # st.events directly
        self._events_on_host = (
            bool(opt.flag & MappingFlag.DTW_OUTPUT_CIGAR)
            or self._stage1_host
        ) and not self._stage1_hybrid
        # whether the stage1 DOWNLOAD carries event values (device
        # detector + a host consumer). Hybrid modes never ship events in
        # the download — the host detected them — even when
        # _events_on_host is True (the distributed engine's DTW pool)
        self._s1_dl_events = self._events_on_host
        # seed slots kept after device-side compaction (seeds with hits
        # are sorted first, original order preserved); rounds carry a
        # dropped-hits counter for the (rare) overflow
        self._ns_out = min(seeds_out, ne)
        self._hmax = opt.max_num_chunk * ne
        # Native batched finalize (round-4, VERDICT r3 item 1): the
        # whole post-DP tail — traceback, chain records, DTW tile
        # descriptors, B&B replay, primary chains, MAPQ, decision, emit
        # fields and next-round carried anchors — runs as two C calls
        # per round (ra_round_chains / ra_round_finalize) instead of
        # per-read Python; Chain objects are never built. Excluded for
        # flags whose outputs need Python-side chain structure.
        from rawalign_tpu import native as _nat

        self._finalize_native = (
            _nat.round_tail_available()
            and not (opt.flag & (MappingFlag.DTW_OUTPUT_CIGAR
                                 | MappingFlag.OUTPUT_CHAINS
                                 | MappingFlag.DTW_LOG_SCORES
                                 | MappingFlag.LOG_ANCHORS
                                 | MappingFlag.LOG_NUM_ANCHORS))
            and not self._events_on_host
        )
        Lref_ = self._ref_cat_host.size
        self._segbase_tbl = np.zeros(max(2 * index.n_seq, 1), np.int64)
        for (strand_, si_), base_ in self._sig_base.items():
            self._segbase_tbl[si_ * 2 + strand_] = base_
        self._evbase_arr = (
            np.arange(batch_size, dtype=np.int64) * self._hmax + Lref_
        )

        _bk_steps = self._bk.n_steps
        _bk_bits = self._bk.b_bits

        def _stage1_core(bt, chunks, lengths, hist, hist_off):
            # bt = (ku, kidx, kcnt, boff) jit arguments (NOT closure
            # constants: same-shape index swaps reuse the compile)
            """Events + sketch + index lookup BOUNDS (+ device event
            history append) — the shared device body of both the plain
            stage1 (hit expansion and anchor sort on the HOST: the real
            hit lists are tiny, hundreds per read) and the fused
            stage1+chain (expansion, sort and chain DP stay on device).

            One packed f32 array each way (int outputs bitcast into the
            f32 payload): the tunneled device runtime serializes
            transfers at ~30 ms + ~45 MB/s EACH regardless of count, so
            both the call count and the byte count matter. Seed slots
            are compacted device-side (hits-first stable sort) to
            ``ns_out`` columns."""
            ev = devents.detect_events_batch(
                chunks,
                lengths,
                w1=opt.window_length1,
                w2=opt.window_length2,
                threshold1=opt.threshold1,
                threshold2=opt.threshold2,
                peak_height=opt.peak_height,
                max_events=ne,
            )
            (lo_c, qc_c, qp_c, cnt_c, scalars, hist) = _stage1_post(
                bt, ev.values, ev.n_events, ev.n_dropped, hist, hist_off
            )
            return ev, lo_c, qc_c, qp_c, cnt_c, scalars, hist

        def _stage1_post(bt, ev_values, ev_n, ev_ndrop, hist, hist_off):
            """Sketch + lookup + history append on an event batch —
            shared by the device stage1 (device-detected events) and the
            hybrid stage1 (host-C-detected events uploaded in place of
            the raw signal)."""

            class _Ev:  # duck-typed view of devents' event batch
                values = ev_values
                n_events = ev_n
                n_dropped = ev_ndrop

            ev = _Ev
            if io.w:
                seeds = dsketch.sketch_events_min_batch(
                    ev.values, ev.n_events, w=io.w, e=io.e, q=io.q, lq=io.lq
                )
            else:
                seeds = dsketch.sketch_events_batch(
                    ev.values, ev.n_events, e=io.e, q=io.q, lq=io.lq
                )
            # device-side seed compaction BEFORE the table lookup: a
            # cheap (flag, idx) permutation sort + gathers — (flag, idx)
            # pairs are unique, so the result is deterministic and keeps
            # valid seeds in original order (the host expansion then
            # produces anchors in the exact order the uncompacted path
            # did) — and searchsorted runs on ns_out columns instead of
            # NE (it was the single most expensive op of this stage)
            B_, NE_ = seeds.hashes.shape
            flag = (~seeds.valid).astype(jnp.int32)
            idx0 = jnp.broadcast_to(
                jnp.arange(NE_, dtype=jnp.int32)[None, :], (B_, NE_)
            )
            _f, perm = jax.lax.sort((flag, idx0), dimension=1, num_keys=1)
            perm_c = perm[:, : self._ns_out]
            h_c = jnp.take_along_axis(seeds.hashes, perm_c, axis=1)
            qp_c = jnp.take_along_axis(
                seeds.qpos.astype(jnp.int32), perm_c, axis=1
            )
            v_c = jnp.take_along_axis(seeds.valid, perm_c, axis=1)
            n_valid = jnp.sum(seeds.valid, axis=1).astype(jnp.int32)
            # seeds (not hits — they were never looked up) beyond ns_out
            n_compact_dropped = jnp.maximum(n_valid - self._ns_out, 0)
            bk = dquery.BucketedKeys(*bt, _bk_steps, _bk_bits)
            lo_c, count = dquery.lookup_bounds(bk, h_c)
            over = count > max_occ
            n_occ_dropped = jnp.sum(
                jnp.where(v_c & over, count, 0), axis=1
            ).astype(jnp.int32)
            cnt_c = jnp.where(v_c & ~over, count, 0)
            # pack (qpos, count) into one int32 column block (shared
            # codec with the distributed engine — stage1_codec.py): the
            # download shrinks by one NS-wide block (~190 KB/round at
            # the defaults — the tunnel moves ~16 MB/s down)
            qc_c = stage1_codec.pack_qc(qp_c, cnt_c)
            lo_c = lo_c.astype(jnp.int32)
            # hits-first stable permutation of the compacted columns:
            # zero-count slots (valid seeds without index hits, or
            # over-occ) emit no anchors, so moving them behind the hit
            # slots cannot change the expanded anchor order — but it
            # makes the nonzero counts a contiguous PREFIX, which lets
            # the host fetch only an adaptive prefix of the lo/qc
            # blocks (the stage1 download is the round's largest;
            # see the prefix fetch in _round_gen)
            perm2 = stage1_codec.hits_first_perm(cnt_c)
            lo_c = jnp.take_along_axis(lo_c, perm2, axis=1)
            qc_c = jnp.take_along_axis(qc_c, perm2, axis=1)
            qp_c = jnp.take_along_axis(qp_c, perm2, axis=1)
            cnt_c = jnp.take_along_axis(cnt_c, perm2, axis=1)
            # append this chunk's events to the per-slot history (the
            # construction bounds hist_off + ne <= hmax: each of the
            # <= max_num_chunk chunks appends <= ne events)
            hist = jax.vmap(
                lambda h, e, o: jax.lax.dynamic_update_slice(h, e, (o,))
            )(hist, ev.values, hist_off)
            scalars = jnp.stack(
                [
                    ev.n_events.astype(jnp.int32),
                    ev.n_dropped.astype(jnp.int32),
                    n_occ_dropped,
                    n_compact_dropped.astype(jnp.int32),
                ],
                axis=1,
            )
            return lo_c, qc_c, qp_c, cnt_c, scalars, hist

        def _stage1(bt, packed_in, hist, hist_off):
            chunks = packed_in[:, :-1]
            lengths = packed_in[:, -1].astype(jnp.int32)
            ev, lo_c, qc_c, _qp, _cnt, scalars, hist = _stage1_core(
                bt, chunks, lengths, hist, hist_off
            )
            out = stage1_codec.pack_stage1(
                ev.values, lo_c, qc_c, scalars,
                include_events=self._events_on_host,
            )
            return out, hist

        self._stage1_core = _stage1_core
        self._bt = (self._bk.ku, self._bk.kidx, self._bk.kcnt, self._bk.boff)
        _stage1_jit = jax.jit(_stage1, donate_argnums=(2,))
        self._stage1 = lambda packed_in, hist, hist_off: _stage1_jit(
            self._bt, packed_in, hist, hist_off
        )

        def _stage1_hy(bt, packed_ev, hist, hist_off):
            """Hybrid stage1: host-C-detected events arrive in the
            upload ((B, ne+2): values | n_events | n_dropped); the
            device does sketch + lookup + history append only. Events
            never appear in the download (the host already has them)."""
            ev_values = packed_ev[:, :ne]
            ev_n = packed_ev[:, ne].astype(jnp.int32)
            ev_nd = packed_ev[:, ne + 1].astype(jnp.int32)
            lo_c, qc_c, _qp, _cnt, scalars, hist = _stage1_post(
                bt, ev_values, ev_n, ev_nd, hist, hist_off
            )
            out = stage1_codec.pack_stage1(
                ev_values, lo_c, qc_c, scalars, include_events=False
            )
            return out, hist

        _stage1_hy_jit = jax.jit(_stage1_hy, donate_argnums=(2,))
        self._stage1_hy = lambda packed_ev, hist, hist_off: _stage1_hy_jit(
            self._bt, packed_ev, hist, hist_off
        )

        # Adaptive stage1 prefix download: _stage1_core's hits-first
        # permutation guarantees nonzero counts occupy a contiguous
        # column prefix, so the host fetches only the first P columns
        # of the lo/qc blocks (+ the scalars) and refetches the full
        # (still-live) output in the rare round where a row overflows
        # P (count[:, P-1] > 0). Cuts the round's largest download
        # ~6x at typical hit densities. Only valid for THIS engine's
        # stage1 (the distributed engine's routed stage1 has no
        # hits-first invariant and clears the flag).
        _ns = self._ns_out

        @functools.partial(jax.jit, static_argnums=(1,))
        def _s1_prefix(packed, p):
            return jnp.concatenate(
                [packed[:, :p], packed[:, _ns : _ns + p], packed[:, 2 * _ns :]],
                axis=1,
            )

        self._s1_prefix = _s1_prefix
        self._s1_hits_first = True
        self._s1_pref = 128
        # per-pipeline-group device event-history buffers (B, hmax)
        self._group_hist: dict[int, jax.Array] = {}
        # host copies for hit expansion
        self._h_val_id = np.asarray(index.val_id)
        self._h_val_ps = np.asarray(index.val_ps)

        import os

        # chaining DP placement: the per-round anchor data is TINY (a
        # few MB of cell updates at window 64), so on link-latency-bound
        # deployments the DP runs on the HOST in C (native.chain_dp,
        # bit-identical to the device kernel by construction —
        # tests/test_native.py fuzzes them against each other), removing
        # one full device round trip per round (upload + fetch). The
        # device path stays for mesh-sharded runs (the distributed
        # engine forces it) and as the no-toolchain fallback.
        if chain_impl not in ("auto", "native", "device"):
            raise ValueError(f"chain_impl must be auto|native|device: {chain_impl}")
        if chain_impl == "auto":
            from rawalign_tpu import native as _native

            chain_impl = (
                "native" if _native.chain_dp_available() else "device"
            )
        elif chain_impl == "native":
            from rawalign_tpu import native as _native

            if not _native.chain_dp_available():
                raise RuntimeError(
                    "chain_impl='native' requires the native host library "
                    "(make -C native)"
                )
        self._chain_native = chain_impl == "native"
        # stage1 placement. "device" (default): events + sketch + lookup
        # run as one jitted dispatch — the TPU-first path, right when
        # the host:device compute ratio favors the chip. "host": the
        # same stage runs on the host (golden float64 event detector —
        # the C-double reference semantics, revent.c:22-75 — + native C
        # sketch + numpy searchsorted), leaving the round's ONLY device
        # round trip the DTW tile evaluation; right on link-latency-
        # bound deployments (this dev environment tunnels the chip at
        # ~30 ms/transfer) or event-rate-bound hosts. Downstream
        # (expansion, chain DP, traceback, DTW, decisions) is shared, so
        # both modes produce the same PAF wherever their event
        # detectors agree (f32 scan vs C-double: ulp flips on ~1 read
        # in 10 move an event boundary; tests pin host == golden
        # exactly and device == golden on the standard workloads).
        # chain traceback + Chain assembly: C fast path when available
        # (identical output; tests/test_native.py pins equality)
        from rawalign_tpu import native as _native

        self._chains_from_dp = (
            postprocess.chains_from_dp_fast
            if _native.chains_from_dp_available()
            else postprocess.chains_from_dp
        )

        # the fused kernel on real hardware; the XLA scan on CPU (it is
        # the bit-equivalent reference — interpret-mode Pallas would run
        # the grid step-by-step in Python)
        scan_chain_fn = functools.partial(
            dchain.chain_dp_batch,
            window=chain_window,
            e=io.e,
            max_gap=opt.max_gap_length,
            max_target_gap=opt.max_target_gap_length,
            max_skips=opt.max_num_skips,
        )
        if (
            os.environ.get("RAWALIGN_TPU_CHAIN_IMPL", "pallas") == "pallas"
            and jax.default_backend() != "cpu"
        ):
            from rawalign_tpu.map import chain_pallas

            pallas_chain_fn = functools.partial(
                chain_pallas.chain_dp_batch_pallas,
                window=chain_window,
                e=io.e,
                max_gap=opt.max_gap_length,
                max_target_gap=opt.max_target_gap_length,
                max_skips=opt.max_num_skips,
            )

            def chain_fn(seg, tgt, qry, n, *a, **kw):
                # the Pallas kernel keeps the (A, 128) anchor panels +
                # score scratch in VMEM; beyond ~8k anchors (the
                # lossless escalation at 50Mb-scale multiplicities) that
                # exceeds VMEM, so wide rounds run the bit-equivalent
                # HBM-streamed XLA scan instead
                if seg.shape[1] > 8192:
                    return scan_chain_fn(seg, tgt, qry, n, *a, **kw)
                return pallas_chain_fn(seg, tgt, qry, n, *a, **kw)
        else:
            chain_fn = scan_chain_fn
        self._chain_fn = chain_fn  # overridable hook (distributed engine)

        @jax.jit
        def _chain_packed(packed):
            # one int32 array in ([seg | tgt | qry | n], (B, 3A+1)), one
            # f32 array out ([scores | bitcast preds], (B, 2A)): see the
            # transfer-cost note on _stage1
            A = (packed.shape[1] - 1) // 3
            dp = chain_fn(
                packed[:, :A],
                packed[:, A : 2 * A],
                packed[:, 2 * A : 3 * A],
                packed[:, 3 * A],
            )
            return jnp.concatenate(
                [
                    dp.scores.astype(jnp.float32),
                    jax.lax.bitcast_convert_type(
                        dp.preds.astype(jnp.int32), jnp.float32
                    ),
                ],
                axis=1,
            )

        self._chain_dp = _chain_packed

        # ---- fused stage1+chain (opt-in; ctor fused=True) ----------------
        # One device dispatch runs events + sketch + lookup + hit
        # expansion + carried-anchor merge + 4-key sort + chain DP; the
        # host REPLAYS expansion+lexsort from the (lo, qc) blocks it
        # downloads anyway (deterministic given the shared idx
        # tie-break), so preds index the replayed anchor array exactly.
        # Cuts the per-round uploads (the anchor upload — the largest
        # transfer — disappears) and is PAF-identical to the two-step
        # path (tests/test_fused_engine.py, verified on real TPU).
        #
        # Measured OFF by default on this environment: the tunneled
        # link uploads at ~45 MB/s (cheap) while the fused stage's
        # device cost (three multi-operand sorts at E=2*budget+carried,
        # expansion gathers, full-width DP) serializes across pipeline
        # groups on the one chip — interleaved A/B on the 200 kb bench:
        # two-step 507 reads/s vs fused 426 (P=0) / 414 (P=512) /
        # 480 (P=full). On deployments where host->device latency or
        # upload bandwidth dominates instead, turn it on.
        #
        # ONE static shape variant: compiles of the fused program on the
        # remote TPU compile service run ~4 minutes EACH (measured), so
        # width bucketing would multiply that. The DP always runs at the
        # full anchor budget (device compute is overlapped by the
        # pipeline groups; link time is the scarce resource) and only a
        # fixed P-column prefix of scores/preds rides the main download;
        # the full-width DP output stays device-resident and rounds that
        # replay more than P anchors refetch a wider prefix (cheap slice
        # jit).
        #
        # Hits are expanded to TWICE the anchor budget and over-budget
        # rows apply the same occ-ranked drop as the host (unique
        # compound key occ*E+pos -> kth-smallest threshold -> stable
        # compaction), so the common over-budget round stays fused;
        # only rows whose true anchor count exceeds the expansion width
        # (or whose carried anchors exceed the carried width) escalate
        # to the two-step path — detected on the host from the replayed
        # counts, so never silently wrong.
        #
        # P = 0: the main fetch carries NO DP columns; every round does
        # a second, exactly-sized (pow2 of the replayed max) async
        # prefix fetch of the device-resident DP output. Same download
        # bytes and fetch count as the two-step path, but the anchor
        # upload (the largest per-round transfer) is gone, and light
        # workloads fetch narrow prefixes instead of a fixed-width
        # block. (A nonzero P was measured WORSE on the tunneled link:
        # heavy rounds paid the prefix AND the refetch.)
        self._fused = bool(fused)
        self._fused_w = self.max_anchors
        self._fused_exp = 2 * self.max_anchors
        self._fused_c = min(512, self.max_carried)
        self._fused_p = 0
        self._slice_cache: dict[int, object] = {}
        SENT_j = jnp.int32(SENT)
        IMAX = jnp.int32(0x7FFFFFFF)

        def _fused_stage(bt, val_id, val_ps, packed_in, carried, hist,
                         hist_off):
            A = self._fused_w
            A_exp = self._fused_exp
            L = opt.chunk_size
            chunks = packed_in[:, :L]
            lengths = packed_in[:, L].astype(jnp.int32)
            ev, lo_c, qc_c, qp_c, cnt_c, scalars, hist = _stage1_core(
                bt, chunks, lengths, hist, hist_off
            )
            B_, NS = cnt_c.shape
            C = (carried.shape[1] - 2) // 3
            cseg = carried[:, :C]
            ctgt = carried[:, C : 2 * C]
            cqry = carried[:, 2 * C : 3 * C]
            n_car = carried[:, 3 * C]
            offset = carried[:, 3 * C + 1]
            # expand hits: output slot j belongs to the seed whose
            # inclusive cumsum first exceeds j (the device replay of the
            # host's np.repeat expansion — same seed order, same
            # within-seed order)
            cum = jnp.cumsum(cnt_c, axis=1)
            total = cum[:, -1]
            j = jnp.arange(A_exp, dtype=jnp.int32)
            seed = jax.vmap(
                lambda c: jnp.searchsorted(c, j, side="right")
            )(cum).astype(jnp.int32)
            seed = jnp.minimum(seed, NS - 1)
            cum_excl = cum - cnt_c
            start = jnp.take_along_axis(lo_c, seed, axis=1)
            within = j[None, :] - jnp.take_along_axis(cum_excl, seed, axis=1)
            hidx = jnp.clip(start + within, 0, val_id.shape[0] - 1)
            vhit = j[None, :] < total[:, None]
            tid = val_id[hidx].astype(jnp.int32)
            ps = val_ps[hidx]
            tpos = ((ps >> 1) & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            strd = (ps & jnp.uint32(1)).astype(jnp.int32)
            seg_h = tid * 2 + strd
            qry_h = jnp.take_along_axis(qp_c, seed, axis=1) + offset[:, None]
            idx_h = jnp.broadcast_to(j[None, :], (B_, A_exp))
            # per-anchor parent-seed occurrence count (the over-budget
            # drop rank; host replay: occ = np.repeat(reps, reps))
            occ_h = jnp.take_along_axis(cnt_c, seed, axis=1)
            k = jnp.arange(C, dtype=jnp.int32)
            vcar = k[None, :] < n_car[:, None]
            idx_c = total[:, None] + k[None, :]
            seg_all = jnp.concatenate(
                [jnp.where(vhit, seg_h, SENT_j), jnp.where(vcar, cseg, SENT_j)],
                axis=1,
            )
            tgt_all = jnp.concatenate(
                [jnp.where(vhit, tpos, 0), jnp.where(vcar, ctgt, 0)], axis=1
            )
            qry_all = jnp.concatenate(
                [jnp.where(vhit, qry_h, 0), jnp.where(vcar, cqry, 0)], axis=1
            )
            idx_all = jnp.concatenate([idx_h, idx_c], axis=1)
            # carried anchors rank occ 0 (always kept under pressure)
            occ_all = jnp.concatenate(
                [occ_h, jnp.zeros((B_, C), jnp.int32)], axis=1
            )
            valid_all = jnp.concatenate([vhit, vcar], axis=1)
            # 4-key ascending sort == np.lexsort((qry, tgt, seg)) with
            # stable tie-break (idx = concatenation order); padding
            # (seg=SENT=INT32_MAX) sorts last; occ rides as payload
            seg_s, tgt_s, qry_s, _, occ_s, val_s = jax.lax.sort(
                (seg_all, tgt_all, qry_all, idx_all, occ_all,
                 valid_all.astype(jnp.int32)),
                dimension=1, num_keys=4,
            )
            # over-budget drop, identical to the host replay: keep the
            # A anchors with the smallest (occ, sorted-position). The
            # compound key occ*E+pos is unique (pos distinct) and fits
            # int32 (occ < 2^16 by validate_bounds, E a few thousand),
            # so "<= kth smallest" keeps exactly min(A, m) anchors.
            E = A_exp + C
            pos = jnp.broadcast_to(
                jnp.arange(E, dtype=jnp.int32)[None, :], (B_, E)
            )
            sortk = jnp.where(val_s == 1, occ_s * E + pos, IMAX)
            kth = jax.lax.sort(sortk, dimension=1)[:, A - 1]
            keep = (sortk <= kth[:, None]) & (val_s == 1)
            # stable compaction: kept anchors first, in sorted order
            key2 = jnp.where(keep, pos, E + pos)
            _, seg_k, tgt_k, qry_k = jax.lax.sort(
                (key2,
                 jnp.where(keep, seg_s, SENT_j),
                 jnp.where(keep, tgt_s, 0),
                 jnp.where(keep, qry_s, 0)),
                dimension=1, num_keys=1,
            )
            n_dp = jnp.minimum(total + n_car, A).astype(jnp.int32)
            dp = chain_fn(seg_k[:, :A], tgt_k[:, :A], qry_k[:, :A], n_dp)
            P = self._fused_p
            out = stage1_codec.pack_stage1_fused(
                ev.values, lo_c, qc_c, scalars,
                dp.scores[:, :P], dp.preds[:, :P],
                include_events=self._events_on_host,
            )
            # full-width DP output stays device-resident: rounds that
            # replay more than P anchors refetch a wider prefix
            dp_full = jnp.concatenate(
                [
                    dp.scores.astype(jnp.float32),
                    jax.lax.bitcast_convert_type(
                        dp.preds.astype(jnp.int32), jnp.float32
                    ),
                ],
                axis=1,
            )
            return out, dp_full, hist

        _fused_jit = jax.jit(_fused_stage, donate_argnums=(5,))
        self._stage1_fused = (
            lambda packed_in, carried, hist, hist_off: _fused_jit(
                self._bt, self._val_id, self._val_ps, packed_in, carried,
                hist, hist_off,
            )
        )

        def _dp_prefix(dp_full, w: int):
            """Fetch a w-column prefix of the device-resident DP output
            (scores cols [0,A), preds cols [A,2A))."""
            f = self._slice_cache.get(w)
            if f is None:
                A = self._fused_w
                f = jax.jit(
                    lambda d: jnp.concatenate(
                        [d[:, :w], d[:, A : A + w]], axis=1
                    )
                )
                self._slice_cache[w] = f
            return f(dp_full)

        self._dp_prefix = _dp_prefix
        self.counters = {
            "seed_hits_compact_dropped": 0,
            "seed_hits_dropped": 0,
            "anchors_dropped": 0,
            "events_dropped": 0,
            "reads_mapped": 0,
            "reads_processed": 0,
            "dtw_tiles": 0,
            "dtw_cells": 0,
            "dtw_tiles_device": 0,
            "dtw_tiles_host_large": 0,
            "fused_escalations": 0,
            "fused_refetches": 0,
            "stage1_prefix_refetches": 0,
        }
        # wall-clock per engine phase (seconds), for profiling
        self.phase_times = {
            "build_inputs": 0.0,
            "stage_chain": 0.0,
            "host_anchors": 0.0,
            "chain_dp": 0.0,
            "traceback": 0.0,
            "dtw_prep": 0.0,
            "dtw": 0.0,
            "finalize": 0.0,
            "rounds": 0,
        }

    # ------------------------------------------------------------------
    def close(self) -> None:
        """Release the worker pool (idempotent)."""
        pool, self._pool = self._pool, None
        if pool is not None:
            pool.shutdown(wait=False)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def __del__(self):  # best-effort fallback for non-context users
        try:
            self.close()
        except Exception:
            pass

    # ------------------------------------------------------------------
    def map_reads(
        self, reads: Iterable[tuple[str, np.ndarray]]
    ) -> Iterator[paf.MappingResult]:
        """Continuous batching with software pipelining: ``pipeline_depth``
        read groups advance round-robin, one sync segment at a time, so
        one group's host work overlaps another group's in-flight device
        work (the device link costs ~60 ms per sync — interleaving hides
        most of it)."""
        it = iter(reads)
        depth = max(1, self.pipeline_depth)
        # slots are POSITION-STABLE: a read keeps its slot index for its
        # whole life (its device event-history row), freed slots are
        # refilled in place (continuous batching)
        group_slots: list[list[_ReadState | None]] = [
            [None] * self.batch_size for _ in range(depth)
        ]
        gens: list = [None] * depth
        exhausted = False
        while True:
            progressed = False
            for g in range(depth):
                if gens[g] is None:
                    slots = group_slots[g]
                    for i, st in enumerate(slots):
                        if st is not None and (
                            st.done
                            or st.chunk_ptr >= st.qlen
                            or st.chunks_done >= self.opt.max_num_chunk
                        ):
                            yield self._emit(st)
                            slots[i] = None
                    if not exhausted:
                        for i in range(self.batch_size):
                            if slots[i] is not None:
                                continue
                            try:
                                name, sig = next(it)
                            except StopIteration:
                                exhausted = True
                                break
                            slots[i] = _ReadState(name, sig)
                    if any(st is not None for st in slots):
                        gens[g] = self._round_gen(slots, g)
                if gens[g] is not None:
                    progressed = True
                    try:
                        next(gens[g])
                    except StopIteration:
                        gens[g] = None
            if not progressed:
                break

    # ------------------------------------------------------------------
    def _round_gen(self, slots: list, g: int):
        opt = self.opt
        pt = self.phase_times
        pt["rounds"] += 1
        t_round0 = time.perf_counter()
        t_mark = t_round0
        n_live = sum(1 for st in slots if st is not None)

        def charge_round():
            # mt_mode="share" (default): attribute each live read its
            # share of the round's wall time (round cost / live reads) —
            # the batched round's cost is amortized across every read it
            # advanced. mt_mode="wall" (strict): charge each live read
            # the FULL round wall, i.e. the read's wall clock across its
            # live rounds — the reference's per-read chunk-loop timer
            # semantics (rmap.cpp:684-694,731), directly comparable to
            # the binary's mt:f but double-counting shared batch cost.
            dt = time.perf_counter() - t_round0
            if self.mt_mode == "share":
                dt /= max(1, n_live)
            for st in slots:
                if st is not None:
                    st.map_time += dt

        def mark(phase):
            nonlocal t_mark
            now = time.perf_counter()
            pt[phase] += now - t_mark
            t_mark = now

        # pad to the fixed batch size so every round reuses one compile
        B = self.batch_size
        L = opt.chunk_size
        SENT = self._SENT
        ne = opt.max_events_per_chunk
        hybrid = self._stage1_hybrid
        if hybrid:
            # events replace the raw signal in the upload (~8x smaller)
            packed_in = np.zeros((B, ne + 2), dtype=np.float32)
            hy_counts = np.zeros(B, dtype=np.int64)
            hy_dropped = np.zeros(B, dtype=np.int64)
            hy_live: list = []
            from rawalign_tpu.golden import events as gevents
        else:
            packed_in = np.zeros((B, L + 1), dtype=np.float32)
        hist_off = np.zeros(B, dtype=np.int32)
        # carried anchors (anchors of chains surviving previous chunks,
        # rmap.cpp:343-362) are gathered NOW: the fused path uploads
        # them with the signal, and the host replay reuses these exact
        # arrays so host and device see one anchor order
        carried_lists: dict[int, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        max_car = 0
        for i, st in enumerate(slots):
            if st is None:
                continue
            part = st.signal[st.chunk_ptr : st.chunk_ptr + L]
            if hybrid:
                hy_live.append((i, st, part))
            else:
                packed_in[i, : part.size] = part
                packed_in[i, L] = part.size
            hist_off[i] = st.ev_total
            if st.carried is not None:
                # native finalize already emitted the re-injection
                # arrays in expand_round's input format
                carried_lists[i] = st.carried
                max_car = max(max_car, st.carried[0].size)
            elif st.chains:
                prev_seg, prev_t, prev_q = [], [], []
                for ch in st.chains:
                    s = ch.reference_sequence_index * 2 + ch.strand
                    for t, q in ch.anchors:
                        prev_seg.append(s)
                        prev_t.append(int(t))
                        prev_q.append(int(q))
                carried_lists[i] = (
                    np.asarray(prev_seg, np.int64),
                    np.asarray(prev_t, np.int64),
                    np.asarray(prev_q, np.int64),
                )
                max_car = max(max_car, len(prev_seg))
        if hybrid and hy_live:
            # native C detector — bit-identical to golden's C-double
            # semantics (revent.c); closes the device f32 event parity
            # gap (VERDICT r3 item 4). C releases the GIL, so the
            # per-slot detections run on the worker pool (disjoint rows).
            def _detect(t):
                i, st, part = t
                evs = (
                    gevents.detect_events_fast(part, opt)
                    if part.size
                    else np.zeros(0, np.float32)
                )
                if evs.size > ne:
                    hy_dropped[i] = evs.size - ne
                    evs = evs[:ne]
                hy_counts[i] = evs.size
                if evs.size:
                    st.events = np.concatenate([st.events, evs])
                    packed_in[i, : evs.size] = evs
                packed_in[i, ne] = evs.size
                packed_in[i, ne + 1] = hy_dropped[i]

            if self._pool is not None and len(hy_live) > 1:
                list(self._pool.map(_detect, hy_live))
            else:
                for t in hy_live:
                    _detect(t)
        mark("build_inputs")

        if self._stage1_host:
            # host stage1: the golden-semantics (C-double) event
            # detector + C sketch + numpy searchsorted — no device round
            # trip; the round's only sync is the DTW. Events live on the
            # host (self._events_on_host forced at construction).
            (
                h_lo, h_qpos, h_count, ev_counts, ev_dropped, hit_dropped,
            ) = self._stage1_host_round(slots)
            compact_dropped = np.zeros(B, dtype=np.int64)
            ev_values = None
            fused_scores = fused_preds = None
            use_fused = False
            dp_full = None
            mark("stage_chain")
            self.counters["events_dropped"] += int(ev_dropped.sum())
            self.counters["seed_hits_dropped"] += int(hit_dropped.sum())
            chain_this_round = ev_counts >= opt.min_events
            for i, st in enumerate(slots):
                if st is None:
                    chain_this_round[i] = False
                    continue
                st.ev_total += int(ev_counts[i])
            return (yield from self._round_tail(
                slots, g, B, L, SENT, carried_lists, chain_this_round,
                h_lo, h_qpos, h_count, ev_counts, hit_dropped,
                compact_dropped, use_fused, fused_scores, fused_preds,
                dp_full, mark, charge_round,
            ))

        hist = self._group_hist.get(g)
        if hist is None:
            hist = jnp.zeros((B, self._hmax), jnp.float32)
        use_fused = self._fused and max_car <= self._fused_c
        dp_full = None
        if use_fused:
            c_round = self._fused_c
            carried_in = np.zeros((B, 3 * c_round + 2), dtype=np.int32)
            for i, (cs, ct, cq) in carried_lists.items():
                m = cs.size
                carried_in[i, :m] = cs
                carried_in[i, c_round : c_round + m] = ct
                carried_in[i, 2 * c_round : 2 * c_round + m] = cq
                carried_in[i, 3 * c_round] = m
            for i, st in enumerate(slots):
                if st is not None:
                    carried_in[i, 3 * c_round + 1] = st.offset
            stage1_fut, dp_full, hist_new = self._stage1_fused(
                packed_in, carried_in, hist, hist_off
            )
        elif hybrid:
            stage1_fut, hist_new = self._stage1_hy(packed_in, hist, hist_off)
        else:
            stage1_fut, hist_new = self._stage1(packed_in, hist, hist_off)
        self._group_hist[g] = hist_new
        P = self._s1_pref
        use_pref = (
            not use_fused
            and self._s1_hits_first
            and not self._s1_dl_events
            and P < self._ns_out
        )
        # start the device->host fetch NOW: device_get only issues the
        # transfer RPC when called, so without this the ~40 ms link
        # latency serializes across pipeline groups instead of hiding
        # behind their host work
        if use_pref:
            pref_fut = self._s1_prefix(stage1_fut, P)
            pref_fut.copy_to_host_async()
        else:
            stage1_fut.copy_to_host_async()
        yield  # other groups' host work overlaps this device work
        from rawalign_tpu import runtime

        if use_pref:
            pref = runtime.fetch(pref_fut, label="stage1 prefix fetch")
            s1 = stage1_codec.unpack_stage1(
                pref, ne=opt.max_events_per_chunk, ns=P,
                events_on_host=False,
            )
            if np.any(s1.count[:, P - 1] > 0):
                # a row may have hit slots beyond the prefix: refetch
                # the full (still-live, non-donated) stage1 output
                self.counters["stage1_prefix_refetches"] += 1
                stage1_fut.copy_to_host_async()
                yield
                packed = runtime.fetch(stage1_fut, label="stage1 fetch")
                s1 = stage1_codec.unpack_stage1(
                    packed, ne=opt.max_events_per_chunk, ns=self._ns_out,
                    events_on_host=False,
                )
            # adapt: next round downloads a pow2 prefix with 2x headroom
            # over this round's widest row (floor 64)
            nhit_max = int((s1.count > 0).sum(axis=1).max()) if B else 0
            p2 = 64
            while p2 < 2 * nhit_max:
                p2 *= 2
            self._s1_pref = min(p2, self._ns_out)
            ev_values = s1.ev_values
            h_lo, h_qpos, h_count = s1.lo, s1.qpos, s1.count
            ev_counts = s1.n_events
            ev_dropped = s1.n_ev_dropped
            hit_dropped = s1.n_occ_dropped
            compact_dropped = s1.n_compact_dropped
            fused_scores = fused_preds = None
            mark("stage_chain")
            self.counters["events_dropped"] += int(ev_dropped.sum())
            self.counters["seed_hits_dropped"] += int(hit_dropped.sum())
            self.counters["seed_hits_compact_dropped"] += int(
                compact_dropped.sum()
            )
            chain_this_round = ev_counts >= opt.min_events
            for i, st in enumerate(slots):
                if st is None:
                    chain_this_round[i] = False
                    continue
                st.ev_total += int(ev_counts[i])
            return (yield from self._round_tail(
                slots, g, B, L, SENT, carried_lists, chain_this_round,
                h_lo, h_qpos, h_count, ev_counts, hit_dropped,
                compact_dropped, use_fused, fused_scores, fused_preds,
                dp_full, mark, charge_round,
            ))

        packed = runtime.fetch(stage1_fut, label="stage1 fetch")
        fused_scores = fused_preds = None
        if use_fused:
            sf = stage1_codec.unpack_stage1_fused(
                packed,
                ne=opt.max_events_per_chunk,
                ns=self._ns_out,
                a=self._fused_p,
                events_on_host=self._events_on_host,
            )
            s1 = sf.stage1
            fused_scores, fused_preds = sf.scores, sf.preds
        else:
            s1 = stage1_codec.unpack_stage1(
                packed,
                ne=opt.max_events_per_chunk,
                ns=self._ns_out,
                events_on_host=self._s1_dl_events,
            )
            if self._s1_hits_first and not self._s1_dl_events:
                # keep the adaptive prefix width tracking even on full
                # fetches, so a one-round spike to ns_out can shrink
                # back next round
                nhit_max = int((s1.count > 0).sum(axis=1).max()) if B else 0
                p2 = 64
                while p2 < 2 * nhit_max:
                    p2 *= 2
                self._s1_pref = min(p2, self._ns_out)
        ev_values = s1.ev_values
        h_lo, h_qpos, h_count = s1.lo, s1.qpos, s1.count
        ev_counts = s1.n_events
        ev_dropped = s1.n_ev_dropped
        hit_dropped = s1.n_occ_dropped
        compact_dropped = s1.n_compact_dropped
        mark("stage_chain")
        self.counters["events_dropped"] += int(ev_dropped.sum())
        self.counters["seed_hits_dropped"] += int(hit_dropped.sum())
        self.counters["seed_hits_compact_dropped"] += int(
            compact_dropped.sum()
        )

        chain_this_round = ev_counts >= opt.min_events
        for i, st in enumerate(slots):
            if st is None:
                chain_this_round[i] = False
                continue
            n_ev = int(ev_counts[i])
            st.ev_total += n_ev
            if n_ev and self._s1_dl_events:
                st.events = np.concatenate([st.events, ev_values[i, :n_ev]])

        return (yield from self._round_tail(
            slots, g, B, L, SENT, carried_lists, chain_this_round,
            h_lo, h_qpos, h_count, ev_counts, hit_dropped,
            compact_dropped, use_fused, fused_scores, fused_preds,
            dp_full, mark, charge_round,
        ))

    # ------------------------------------------------------------------
    def _round_tail(
        self, slots, g, B, L, SENT, carried_lists, chain_this_round,
        h_lo, h_qpos, h_count, ev_counts, hit_dropped, compact_dropped,
        use_fused, fused_scores, fused_preds, dp_full, mark, charge_round,
    ):
        """Anchor expansion -> chaining -> traceback -> DTW -> decisions:
        the stage1-independent remainder of one round, shared by the
        device and host stage1 paths."""
        opt = self.opt

        # host: expand hit lists (tiny), merge carried anchors, sort, pad
        # — one batched pass for the whole round (map/anchors.py; the
        # occ-ranked over-budget drop is documented there)
        A = self.max_anchors
        if not use_fused and chain_this_round.any():
            # lossless sizing: grow A to the round's true anchor demand
            # (hits + carried) instead of decimating. The host C chain
            # DP takes any width; the DEVICE chain path escalates to the
            # next power-of-two width class (a_round below), compiling
            # one extra kernel variant per class — the same
            # escalate-not-decimate policy tiles.py uses for DTW shapes,
            # so the device/distributed engine matches the reference's
            # uncapped hit appending (rmap.cpp:371-391) too.
            need = h_count.sum(axis=1, dtype=np.int64)
            for ci_, cl in carried_lists.items():
                need[ci_] += cl[0].size
            nmax = int(need[chain_this_round].max())
            if nmax > A:
                A = 1 << int(np.ceil(np.log2(nmax)))
            A = min(A, self.max_anchors_ceiling)
        seg_b = np.full((B, A), SENT, dtype=np.int32)
        tgt_b = np.zeros((B, A), dtype=np.int32)
        qry_b = np.zeros((B, A), dtype=np.int32)
        n_anch = np.zeros(B, dtype=np.int32)
        read_offsets = np.zeros(B, dtype=np.int64)
        for i, st in enumerate(slots):
            if st is not None:
                read_offsets[i] = st.offset
        use_dtw = bool(
            opt.flag
            & (MappingFlag.DTW_EVALUATE_CHAINS | MappingFlag.DTW_LOG_SCORES)
        )

        # Threaded tail: expansion + chain DP + traceback are C (GIL
        # released) — run them on the worker pool with a yield in
        # between, so they overlap other pipeline groups' host Python
        # and device waits (the measured ~1.2 ms/read host tail was the
        # round-3 throughput ceiling). Excluded when anchors must be
        # logged (ordering) or a fused/device chain path is active.
        if (
            self._chain_native
            and not use_fused
            and self._pool is not None
            and chain_this_round.any()
            and not (opt.flag
                     & (MappingFlag.LOG_ANCHORS | MappingFlag.LOG_NUM_ANCHORS))
        ):
            from rawalign_tpu import native

            io = self.index.opt
            fin_native = self._finalize_native
            use_dtw_eval = bool(opt.flag & MappingFlag.DTW_EVALUATE_CHAINS)

            def _work():
                import os as _os
                import time as _time

                prof = _os.environ.get("RAWALIGN_TPU_TAIL_PROF")
                t0 = _time.perf_counter()
                _, _, dropped = manchors.expand_round(
                    h_lo, h_qpos, h_count,
                    chain_this_round, read_offsets, carried_lists,
                    self._h_val_id, self._h_val_ps, A,
                    seg_b, tgt_b, qry_b, n_anch,
                )
                t1 = _time.perf_counter()
                scores, preds = native.chain_dp(
                    seg_b, tgt_b, qry_b, n_anch,
                    window=self.chain_window,
                    e=io.e,
                    max_gap=opt.max_gap_length,
                    max_target_gap=opt.max_target_gap_length,
                    max_skips=opt.max_num_skips,
                )
                t2 = _time.perf_counter()
                if prof:
                    print(
                        f"[tail] A={A} n={int(n_anch.sum())} "
                        f"expand={t1-t0:.3f}s dp={t2-t1:.3f}s",
                        flush=True,
                    )
                if fin_native:
                    from rawalign_tpu.map.postprocess import (
                        BorderConstraint,
                        FillMethod,
                    )

                    rec = native.round_chains(
                        seg_b, tgt_b, qry_b, scores, preds, n_anch,
                        chain_this_round.astype(np.uint8), A,
                        min_chaining_score=opt.min_chaining_score,
                        num_best_chains=opt.num_best_chains,
                        min_num_anchors=opt.min_num_anchors,
                        disable_filter=bool(
                            opt.flag
                            & MappingFlag.DISABLE_CHAININGSCORE_FILTERING
                        ),
                        sort_for_dtw=use_dtw,
                        use_dtw=use_dtw_eval,
                        border_global=(
                            opt.dtw_border_constraint
                            == BorderConstraint.GLOBAL
                        ),
                        fill_full=(
                            opt.dtw_fill_method == FillMethod.FULL
                        ),
                        band_frac=opt.dtw_band_radius_frac,
                        segbase=self._segbase_tbl,
                        ev_base=self._evbase_arr,
                    )
                    if prof:
                        print(
                            f"[tail] chains={_time.perf_counter()-t2:.3f}s",
                            flush=True,
                        )
                    return dropped, rec, None
                chains_map: dict[int, list[gchain.Chain]] = {}
                for i in range(B):
                    if not chain_this_round[i]:
                        continue
                    ch = self._chains_from_dp(
                        seg_b[i], tgt_b[i], qry_b[i], scores[i], preds[i],
                        int(n_anch[i]), opt,
                    )
                    if use_dtw:
                        ch.sort(key=lambda c: c.chaining_score, reverse=True)
                    chains_map[i] = ch
                return dropped, None, chains_map

            tail_fut = self._pool.submit(_work)
            mark("host_anchors")
            yield
            dropped, rec, per_read_chains = tail_fut.result()
            self.counters["anchors_dropped"] += dropped
            mark("chain_dp")
            if rec is not None:
                yield from self._round_tail_post_native(
                    slots, g, B, L, rec, chain_this_round, ev_counts,
                    use_dtw_eval, mark, charge_round,
                )
            else:
                yield from self._round_tail_post(
                    slots, g, B, L, per_read_chains, chain_this_round,
                    ev_counts, use_dtw, mark, charge_round,
                )
            return

        max_used, max_true, dropped = manchors.expand_round(
            h_lo, h_qpos, h_count,
            chain_this_round, read_offsets, carried_lists,
            self._h_val_id, self._h_val_ps, A,
            seg_b, tgt_b, qry_b, n_anch,
        )
        self.counters["anchors_dropped"] += dropped
        if opt.flag & (MappingFlag.LOG_ANCHORS | MappingFlag.LOG_NUM_ANCHORS):
            for i, st in enumerate(slots):
                if not chain_this_round[i]:
                    continue
                m = int(n_anch[i])
                if opt.flag & MappingFlag.LOG_ANCHORS:
                    by_key: dict[tuple[int, int], list[tuple[int, int]]] = {}
                    for k in range(m):
                        s = int(seg_b[i, k])
                        by_key.setdefault((s & 1, s >> 1), []).append(
                            (int(tgt_b[i, k]), int(qry_b[i, k]))
                        )
                    gchain.log_anchors(
                        by_key, st.name, self.index.seq_names,
                        self.index.n_seq,
                    )
                if opt.flag & MappingFlag.LOG_NUM_ANCHORS:
                    # total seed hits incl. those dropped by the occ cap
                    # (the reference counts before appending, rmap.cpp:381)
                    gchain.log_num_anchors(
                        st.name,
                        st.offset,
                        int(ev_counts[i]),
                        int(h_count[i].sum())
                        + int(hit_dropped[i])
                        + int(compact_dropped[i]),
                    )
        mark("host_anchors")

        if not chain_this_round.any():
            for st in slots:
                if st is None:
                    continue
                st.chunk_ptr += L
                st.chunks_done += 1
            mark("finalize")
            charge_round()
            return

        if use_fused and max_true <= self._fused_exp:
            # the device DP saw exactly the anchors the host replayed
            # (same expansion order, same 4-key sort) — its outputs are
            # valid as-is; the chain upload+download round trip is gone
            if max_used <= self._fused_p:
                scores, preds = fused_scores, fused_preds
            else:
                # replayed wider than the downloaded prefix: refetch a
                # wider prefix of the device-resident full-width DP
                # output (an extra fetch but no recompute; yields so
                # other pipeline groups' host work hides the link
                # latency, like every other in-round fetch)
                self.counters["fused_refetches"] += 1
                w = 256
                while w < max_used:
                    w *= 2
                w = min(w, self._fused_w)
                wide_fut = self._dp_prefix(dp_full, w)
                wide_fut.copy_to_host_async()
                yield
                from rawalign_tpu import runtime

                wide = runtime.fetch(wide_fut, label="DP prefix refetch")
                scores = wide[:, :w]
                preds = wide.view(np.int32)[:, w:]
            mark("chain_dp")
        elif self._chain_native:
            # host C chaining DP (bit-identical to the device kernel):
            # no anchor upload, no DP fetch — the round's only device
            # round trips are stage1 and DTW
            from rawalign_tpu import native

            if use_fused:
                self.counters["fused_escalations"] += 1
            io = self.index.opt
            scores, preds = native.chain_dp(
                seg_b, tgt_b, qry_b, n_anch,
                window=self.chain_window,
                e=io.e,
                max_gap=opt.max_gap_length,
                max_target_gap=opt.max_target_gap_length,
                max_skips=opt.max_num_skips,
            )
            mark("chain_dp")
        else:
            # escalation: the true anchor count outgrew the fused
            # round's static width (or fusion is off) — run the
            # two-step path on the host-built (possibly decimated)
            # anchor arrays; anchor axis bucketed to powers of two
            if use_fused:
                self.counters["fused_escalations"] += 1
            a_round = 256
            while a_round < max_used:
                a_round *= 2
            a_round = min(a_round, A)
            packed_c = np.empty((B, 3 * a_round + 1), dtype=np.int32)
            packed_c[:, :a_round] = seg_b[:, :a_round]
            packed_c[:, a_round : 2 * a_round] = tgt_b[:, :a_round]
            packed_c[:, 2 * a_round : 3 * a_round] = qry_b[:, :a_round]
            packed_c[:, 3 * a_round] = n_anch
            dp_fut = self._chain_dp(packed_c)
            dp_fut.copy_to_host_async()  # see the stage1 note
            yield
            from rawalign_tpu import runtime

            dp_out = runtime.fetch(dp_fut, label="chain-DP fetch")
            scores = dp_out[:, :a_round]
            preds = dp_out.view(np.int32)[:, a_round:]
            mark("chain_dp")

        # host traceback + DTW + decisions
        per_read_chains: dict[int, list[gchain.Chain]] = {}
        for i, st in enumerate(slots):
            if not chain_this_round[i]:
                continue
            chains = self._chains_from_dp(
                seg_b[i], tgt_b[i], qry_b[i], scores[i], preds[i],
                int(n_anch[i]), opt,
            )
            if use_dtw:
                chains.sort(key=lambda c: c.chaining_score, reverse=True)
            per_read_chains[i] = chains
        yield from self._round_tail_post(
            slots, g, B, L, per_read_chains, chain_this_round,
            ev_counts, use_dtw, mark, charge_round,
        )

    # ------------------------------------------------------------------
    def _round_tail_post(
        self, slots, g, B, L, per_read_chains, chain_this_round,
        ev_counts, use_dtw, mark, charge_round,
    ):
        """DTW tiles -> B&B replay -> primary chains/MAPQ -> decisions:
        the post-chaining remainder of one round."""
        opt = self.opt
        all_descs: list[tuple[int, int, int, int, int, int]] = []
        # tiles of one chain are appended contiguously: record each
        # (read, chain)'s [start, end) run instead of a per-tile owner
        # list (a 30k-entry dict loop showed up in the round profile)
        tile_runs: dict[tuple[int, int], tuple[int, int]] = {}
        tile_off = 0
        ev_parts: list[np.ndarray] = []
        ev_off = 0
        Lref = self._ref_cat_host.size
        if use_dtw:
            for i in list(per_read_chains):
                chains = per_read_chains[i]
                if not chains:
                    continue
                # events grow before chaining in this batched engine, so
                # the read's full event array is already current here
                st = slots[i]
                if self._events_on_host:
                    ev_base = Lref + ev_off
                    ev_parts.append(st.events)
                    ev_off += st.events.size
                else:
                    # resident mode: tiles index this slot's device
                    # event-history row directly
                    ev_base = Lref + i * self._hmax
                for ci, ch in enumerate(chains):
                    ref_base = self._sig_base[
                        (ch.strand, ch.reference_sequence_index)
                    ]
                    rows = postprocess.build_chain_tile_descs_vec(
                        ch, ref_base, ev_base, opt
                    )
                    if len(rows):
                        all_descs.append(rows)
                        tile_runs[(i, ci)] = (tile_off, tile_off + len(rows))
                        tile_off += len(rows)
        mark("traceback")

        if use_dtw and all_descs:
            da = np.concatenate(all_descs)
            ev_cat = (
                np.concatenate(ev_parts)
                if ev_parts
                else np.zeros(0, np.float32)
            )
            pending = self._dtw_submit(
                da,
                ev_cat,
                ev_dev=(
                    None if self._events_on_host else self._group_hist[g]
                ),
                ev_fetch=(
                    None if self._events_on_host else self._make_ev_fetch(g)
                ),
            )
            mark("dtw_prep")
            yield
            costs = tiles.dtw_collect(pending)
            mark("dtw")
            self.counters["dtw_tiles"] += int(da.shape[0])
            self.counters["dtw_cells"] += int(
                np.sum(
                    da[:, 1] * np.minimum(2 * da[:, 4] + 1, da[:, 3])
                )
            )
            costs = np.asarray(costs, dtype=np.float32)
            _empty = np.zeros(0, dtype=np.float32)
            for i in list(per_read_chains):
                chains = per_read_chains[i]
                part_costs = [
                    costs[r[0] : r[1]]
                    if (r := tile_runs.get((i, ci))) is not None
                    else _empty
                    for ci in range(len(chains))
                ]
                post = postprocess.bnb_replay(chains, part_costs, opt)
                if opt.flag & MappingFlag.DTW_EVALUATE_CHAINS:
                    per_read_chains[i] = post

        for i, st in enumerate(slots):
            if st is None:
                continue
            st.chunk_ptr += L
            st.chunks_done += 1
            if not chain_this_round[i]:
                continue
            st.offset += int(ev_counts[i])
            chains = per_read_chains.get(i, [])
            if chains:
                chains = gchain.gen_primary_chains(chains, opt)
                gchain.comp_mapq(chains, opt)
            st.chains = chains
            if self._decision(st):
                st.done = True
        mark("finalize")
        charge_round()

    # ------------------------------------------------------------------
    def _round_tail_post_native(
        self, slots, g, B, L, rec, chain_this_round, ev_counts,
        use_dtw_eval, mark, charge_round,
    ):
        """Native-finalize post: DTW on the C-built descriptors, then one
        ra_round_finalize call replaces the per-read Python B&B/primary/
        MAPQ/decision/emit path (tests pin byte-equality vs the Python
        tail and the golden oracle)."""
        from rawalign_tpu import native

        opt = self.opt
        descs = rec[10]
        mark("traceback")
        costs = np.zeros(0, np.float32)
        if use_dtw_eval and len(descs):
            da = descs
            pending = self._dtw_submit(
                da,
                np.zeros(0, np.float32),
                ev_dev=self._group_hist[g],
                ev_fetch=self._make_ev_fetch(g),
            )
            mark("dtw_prep")
            yield
            costs = tiles.dtw_collect(pending)
            mark("dtw")
            self.counters["dtw_tiles"] += int(da.shape[0])
            self.counters["dtw_cells"] += int(
                np.sum(da[:, 1] * np.minimum(2 * da[:, 4] + 1, da[:, 3]))
            )
        fin = native.round_finalize(
            rec, B, costs,
            use_dtw=use_dtw_eval,
            border_global=False if not use_dtw_eval else (
                opt.dtw_border_constraint
                == postprocess.BorderConstraint.GLOBAL
            ),
            match_bonus=opt.dtw_match_bonus,
            dtw_min_score=opt.dtw_min_score,
            min_bestmap_ratio=opt.min_bestmap_ratio,
            min_meanmap_ratio=opt.min_meanmap_ratio,
            min_chain_anchor=opt.min_chain_anchor,
        )
        car_off = fin["car_off"]
        for i, st in enumerate(slots):
            if st is None:
                continue
            st.chunk_ptr += L
            st.chunks_done += 1
            if not chain_this_round[i]:
                continue
            st.offset += int(ev_counts[i])
            st.chains = []
            nc = int(fin["nc"][i])
            mapped = bool(fin["decision"][i])
            st.fin = {
                "mapped": mapped,
                "nc": nc,
                "seg": int(fin["seg"][i]),
                "start_t": int(fin["start_t"][i]),
                "end_t": int(fin["end_t"][i]),
                "nanch0": int(fin["nanch0"][i]),
                "q_start": int(fin["q_start"][i]),
                "q_end": int(fin["q_end"][i]),
                "mapq": int(fin["mapq"][i]),
                "s1": float(fin["s1"][i]),
                "s2": float(fin["s2"][i]),
                "sm": float(fin["sm"][i]),
                "at": float(fin["at"][i]),
                "aq": float(fin["aq"][i]),
            }
            lo, hi = int(car_off[i]), int(car_off[i + 1])
            st.carried = (
                (fin["car_seg"][lo:hi], fin["car_t"][lo:hi],
                 fin["car_q"][lo:hi])
                if hi > lo
                else None
            )
            if mapped:
                st.done = True
        mark("finalize")
        charge_round()

    # ------------------------------------------------------------------
    def _stage1_host_round(self, slots):
        """Host stage1 for one round: event detection (native C,
        bit-identical to the golden C-double semantics — revent.c), C
        sketching (rsketch.c) and a numpy binary-search lookup over the
        sorted key table. Returns the same (lo, qpos, count, ...) bounds
        the device stage1 downloads; events append to each read's host
        array (the DTW blob uploads the round's event pool)."""
        opt = self.opt
        io = self.index.opt
        from rawalign_tpu import native
        from rawalign_tpu.golden import events as gevents

        B = self.batch_size
        ne = opt.max_events_per_chunk
        L = opt.chunk_size
        keys = self.index.keys
        h_lo = np.zeros((B, ne), np.int32)
        h_qpos = np.zeros((B, ne), np.int32)
        h_count = np.zeros((B, ne), np.int32)
        ev_counts = np.zeros(B, np.int64)
        ev_dropped = np.zeros(B, np.int64)
        hit_dropped = np.zeros(B, np.int64)

        def one(i, st):
            part = st.signal[st.chunk_ptr : st.chunk_ptr + L]
            if part.size == 0:
                return
            evs = gevents.detect_events_fast(part, opt)
            if evs.size > ne:
                ev_dropped[i] = evs.size - ne
                evs = evs[:ne]
            ev_counts[i] = evs.size
            if evs.size:
                st.events = np.concatenate([st.events, evs])
            if evs.size < io.e:
                return
            if io.w:
                h, p = native.sketch_min(evs, io.w, io.e, io.q, io.lq)
            else:
                h, p = native.sketch_reg(evs, io.e, io.q, io.lq)
            if h.size == 0:
                return
            lo = np.searchsorted(keys, h, side="left")
            hi = np.searchsorted(keys, h, side="right")
            cnt = (hi - lo).astype(np.int64)
            over = cnt > self.max_occ
            hit_dropped[i] = int(cnt[over].sum())
            cnt[over] = 0
            m = h.size
            h_lo[i, :m] = lo
            h_qpos[i, :m] = p
            h_count[i, :m] = cnt

        live = [(i, st) for i, st in enumerate(slots) if st is not None]
        # per-read work is C + numpy (GIL released): split across the
        # worker pool; rows are disjoint so writes don't race
        if self._pool is not None and len(live) > 1:
            list(self._pool.map(lambda t: one(*t), live))
        else:
            for i, st in live:
                one(i, st)
        return h_lo, h_qpos, h_count, ev_counts, ev_dropped, hit_dropped

    # ------------------------------------------------------------------
    def _dtw_submit(
        self, da: np.ndarray, ev_cat: np.ndarray, *, ev_dev=None, ev_fetch=None
    ):
        """Dispatch one round's DTW tile descriptors (overridable hook:
        the distributed engine shards the tile axis over its mesh)."""
        pend = self._dtw_submit_inner(
            da, ev_cat, ev_dev=ev_dev, ev_fetch=ev_fetch
        )
        self.counters["dtw_tiles_device"] += len(pend.small_idx)
        self.counters["dtw_tiles_host_large"] += len(pend.large_idx)
        return pend

    def _dtw_submit_inner(
        self, da: np.ndarray, ev_cat: np.ndarray, *, ev_dev=None, ev_fetch=None
    ):
        return tiles.dtw_submit_indexed(
            da[:, 0].astype(np.int32),
            da[:, 1].astype(np.int32),
            da[:, 2].astype(np.int32),
            da[:, 3].astype(np.int32),
            da[:, 4].astype(np.int32),
            da[:, 5].astype(np.int32),
            self._ref_cat_dev,
            ev_cat,
            self._ref_cat_host,
            device_max_n=self.dtw_device_max_n,
            device_max_b=self.dtw_device_max_b,
            ev_dev=ev_dev,
            ev_fetch=ev_fetch,
        )

    # ------------------------------------------------------------------
    def _make_ev_fetch(self, g: int):
        """Host accessor into group g's device event history, for the
        (rare) oversized tiles that fall back to the host DTW."""

        def fetch(idx: int, ln: int) -> np.ndarray:
            hist = self._group_hist[g]
            row, col = divmod(int(idx), self._hmax)
            return np.asarray(hist[row, col : col + ln])

        return fetch

    # ------------------------------------------------------------------
    def _decision(self, st: _ReadState) -> bool:
        shim = gengine.ReadState(read_name=st.name)
        shim.chains = st.chains
        return gengine.is_mapped_with_high_confidence(shim, self.opt)

    # ------------------------------------------------------------------
    def _emit_native(self, st: _ReadState, ci, scale) -> paf.MappingResult:
        """Emit from the ra_round_finalize record — field-identical to
        the Python-Chain path below (rmap.cpp:730-802)."""
        f = st.fin
        mapping_time_ms = st.map_time * 1000.0
        nc = f["nc"]
        if nc:
            tags = paf.build_tags(
                mapping_time_ms=mapping_time_ms,
                n_chunks=ci,
                qlen=st.qlen,
                n_anchors0=f["nanch0"],
                n_chains=nc,
                s1=f["s1"],
                s2=f["s2"],
                sm=f["sm"],
                at=f["at"],
                aq=f["aq"],
                mapped_with_chains=f["mapped"],
            )
        else:
            tags = paf.build_tags(
                mapping_time_ms=mapping_time_ms, n_chunks=ci, qlen=st.qlen
            )
        if f["mapped"]:
            self.counters["reads_mapped"] += 1
            seg = f["seg"]
            ref_idx, strand = seg >> 1, seg & 1
            ref_len = int(self.index.seq_lens[ref_idx])
            frag_len = int(f["end_t"] - f["start_t"] + 1)
            frag_start = (
                int(ref_len + 1 - f["end_t"]) if strand else int(f["start_t"])
            )
            return paf.MappingResult(
                read_name=st.name,
                read_length=paf.scale_pos(scale, f["q_end"]),
                mapped=True,
                read_start_position=paf.scale_pos(scale, f["q_start"]),
                read_end_position=paf.scale_pos(scale, f["q_end"]),
                ref_name=self.index.seq_names[ref_idx],
                ref_len=ref_len,
                fragment_start_position=frag_start,
                fragment_length=frag_len,
                rev=strand,
                mapq=f["mapq"],
                tags=tags,
            )
        return paf.MappingResult(
            read_name=st.name,
            read_length=paf.scale_pos(scale, st.offset),
            mapped=False,
            mapq=0,
            tags=tags,
        )

    def _emit(self, st: _ReadState) -> paf.MappingResult:
        opt = self.opt
        self.counters["reads_processed"] += 1
        ci = max(st.chunks_done, 1)
        offset = st.offset if st.offset else 1
        scale = paf.position_scale_f32(
            ci, opt.chunk_size, offset, opt.sample_rate, opt.bp_per_sec
        )
        if st.fin is not None:
            return self._emit_native(st, ci, scale)
        chains = st.chains  # Python-Chain path (golden-structured tails)
        n_anchors0 = chains[0].n_anchors if chains else 0
        mean_score = paf.mean_score_f32(
            [c.chaining_score for c in chains]
        )
        mapping_time_ms = st.map_time * 1000.0
        mapped = self._decision(st)
        if mapped:
            self.counters["reads_mapped"] += 1
            c0 = chains[0]
            if opt.flag & MappingFlag.DTW_OUTPUT_CIGAR:
                gchain.align_chain(c0, self.index, st.events, opt, cigar=True)
            # f32 left-fold of per-pair deltas + f32 division, exactly
            # the reference's accumulation (rmap.cpp:719-729)
            at, aq = paf.anchor_gap_means_f32(c0.anchors)
            tags = paf.build_tags(
                mapping_time_ms=mapping_time_ms,
                n_chunks=ci,
                qlen=st.qlen,
                n_anchors0=n_anchors0,
                n_chains=len(chains),
                s1=c0.chaining_score,
                s2=chains[1].chaining_score if len(chains) > 1 else 0.0,
                sm=mean_score,
                at=at,
                aq=aq,
                mapped_with_chains=True,
                alns=(
                    c0.alignment_score
                    if opt.flag & MappingFlag.DTW_OUTPUT_CIGAR
                    else None
                ),
                aln=(
                    gengine._dtwresult_to_string(c0.dtw)
                    if opt.flag & MappingFlag.DTW_OUTPUT_CIGAR
                    else None
                ),
                anchors=(
                    gengine._anchors_to_string(c0.anchors)
                    if opt.flag & MappingFlag.OUTPUT_CHAINS
                    else None
                ),
            )
            ref_len = int(self.index.seq_lens[c0.reference_sequence_index])
            frag_start = (
                int(ref_len + 1 - c0.end_position)
                if c0.strand
                else int(c0.start_position)
            )
            return paf.MappingResult(
                read_name=st.name,
                read_length=paf.scale_pos(scale, c0.anchors[0][1]),
                mapped=True,
                read_start_position=paf.scale_pos(scale, c0.anchors[n_anchors0 - 1][1]),
                read_end_position=paf.scale_pos(scale, c0.anchors[0][1]),
                ref_name=self.index.seq_names[c0.reference_sequence_index],
                ref_len=ref_len,
                fragment_start_position=frag_start,
                fragment_length=int(c0.end_position - c0.start_position + 1),
                rev=c0.strand,
                mapq=c0.mapq,
                tags=tags,
            )
        if chains:
            c0 = chains[0]
            if n_anchors0:
                at, aq = paf.anchor_gap_means_f32(c0.anchors)
            else:
                at = aq = 0.0
            tags = paf.build_tags(
                mapping_time_ms=mapping_time_ms,
                n_chunks=ci,
                qlen=st.qlen,
                n_anchors0=n_anchors0,
                n_chains=len(chains),
                s1=c0.chaining_score,
                s2=chains[1].chaining_score if len(chains) > 1 else 0.0,
                sm=mean_score,
                at=at,
                aq=aq,
            )
        else:
            tags = paf.build_tags(
                mapping_time_ms=mapping_time_ms, n_chunks=ci, qlen=st.qlen
            )
        return paf.MappingResult(
            read_name=st.name,
            read_length=paf.scale_pos(scale, st.offset),
            mapped=False,
            mapq=0,
            tags=tags,
        )
