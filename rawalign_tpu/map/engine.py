"""The batched TPU mapping engine.

Replaces the reference's pthread pipeline + per-read chunk loop
(rmap.cpp:667-1052) with continuous batching over fixed-shape device
steps:

  round loop (host):                        device (one jitted stage each):
    gather next 1s-chunk of every live read   stage 1: events + seeds + index hits
    merge carried chain anchors, sort         stage 2: chaining DP
    traceback + candidates (host, cheap)      stage 3: batched banded DTW tiles
    B&B replay, primary chains, MAPQ,
    early-stop decisions; retire finished
    reads and refill slots from the queue

Reads finish at different chunks; the engine retires them by mask and
keeps the batch full (continuous batching) — the TPU-idiomatic analog of
the reference's per-read early exit (rmap.cpp:685-693).
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator

import jax
import jax.numpy as jnp
import numpy as np

from rawalign_tpu.config import MappingFlag, MappingOptions
from rawalign_tpu.golden import chain as gchain
from rawalign_tpu.golden import dtw as gdtw
from rawalign_tpu.golden import engine as gengine
from rawalign_tpu.index.index import RawIndex
from rawalign_tpu.index import query as dquery
from rawalign_tpu.io import paf
from rawalign_tpu.map import chain as dchain
from rawalign_tpu.map import postprocess, tiles
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
        "chains",
        "done",
        "t_start",
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
        self.chains: list[gchain.Chain] = []
        self.done = False
        self.t_start = time.perf_counter()
        self.map_time = 0.0


class MappingEngine:
    """Maps batches of raw-signal reads against a RawIndex."""

    def __init__(
        self,
        index: RawIndex,
        opt: MappingOptions,
        *,
        batch_size: int = 32,
        max_occ: int = 64,
        max_anchors: int = 4096,
        chain_window: int = 64,
    ):
        self.index = index
        self.opt = opt
        self.batch_size = batch_size
        self.max_occ = max_occ
        self.max_anchors = max_anchors
        self.chain_window = chain_window
        self._keys = jnp.asarray(index.keys)
        self._val_id = jnp.asarray(index.val_id)
        self._val_ps = jnp.asarray(index.val_ps)
        self._signals = index.signals  # host {strand: [per-seq float32]}
        io = index.opt
        ne = opt.max_events_per_chunk

        @jax.jit
        def _stage1(keys, val_id, val_ps, chunks, lengths):
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
            seeds = dsketch.sketch_events_batch(
                ev.values, ev.n_events, e=io.e, q=io.q, lq=io.lq
            )
            hits = dquery.query_seeds(
                keys,
                val_id,
                val_ps,
                seeds.hashes,
                seeds.qpos,
                seeds.valid,
                max_occ=max_occ,
            )
            return ev, hits

        self._stage1 = lambda chunks, lengths: _stage1(
            self._keys, self._val_id, self._val_ps, chunks, lengths
        )
        self._chain_dp = jax.jit(
            lambda seg, tgt, qry, n: dchain.chain_dp_batch(
                seg,
                tgt,
                qry,
                n,
                window=chain_window,
                e=io.e,
                max_gap=opt.max_gap_length,
                max_target_gap=opt.max_target_gap_length,
                max_skips=opt.max_num_skips,
            )
        )
        self.counters = {
            "seed_hits_dropped": 0,
            "anchors_dropped": 0,
            "events_dropped": 0,
            "reads_mapped": 0,
            "reads_processed": 0,
            "dtw_tiles": 0,
            "dtw_cells": 0,
        }

    # ------------------------------------------------------------------
    def map_reads(
        self, reads: Iterable[tuple[str, np.ndarray]]
    ) -> Iterator[paf.MappingResult]:
        """Continuous batching over an iterable of (name, signal)."""
        it = iter(reads)
        slots: list[_ReadState] = []
        finished: list[_ReadState] = []
        exhausted = False
        while True:
            # refill
            while not exhausted and len(slots) < self.batch_size:
                try:
                    name, sig = next(it)
                except StopIteration:
                    exhausted = True
                    break
                slots.append(_ReadState(name, sig))
            if not slots:
                break
            self._round(slots)
            still = []
            for st in slots:
                if (
                    st.done
                    or st.chunk_ptr >= st.qlen
                    or st.chunks_done >= self.opt.max_num_chunk
                ):
                    st.map_time = time.perf_counter() - st.t_start
                    finished.append(st)
                else:
                    still.append(st)
            slots = still
            for st in finished:
                yield self._emit(st)
            finished = []

    # ------------------------------------------------------------------
    def _round(self, slots: list[_ReadState]) -> None:
        opt = self.opt
        B = len(slots)
        L = opt.chunk_size
        chunks = np.zeros((B, L), dtype=np.float32)
        lengths = np.zeros(B, dtype=np.int32)
        for i, st in enumerate(slots):
            part = st.signal[st.chunk_ptr : st.chunk_ptr + L]
            chunks[i, : part.size] = part
            lengths[i] = part.size

        ev, hits = self._stage1(chunks, lengths)
        ev_values = np.asarray(ev.values)
        ev_counts = np.asarray(ev.n_events)
        self.counters["events_dropped"] += int(np.asarray(ev.n_dropped).sum())
        self.counters["seed_hits_dropped"] += int(
            np.asarray(hits.n_dropped).sum()
        )
        h_tid = np.asarray(hits.t_id)
        h_tpos = np.asarray(hits.t_pos)
        h_str = np.asarray(hits.strand)
        h_qpos = np.asarray(hits.q_pos)
        h_valid = np.asarray(hits.valid)

        # host: merge carried anchors, sort, pad
        A = self.max_anchors
        seg_b = np.full((B, A), np.int32(0x7FFFFFFF), dtype=np.int32)
        tgt_b = np.zeros((B, A), dtype=np.int32)
        qry_b = np.zeros((B, A), dtype=np.int32)
        n_anch = np.zeros(B, dtype=np.int32)
        chain_this_round = np.zeros(B, dtype=bool)
        for i, st in enumerate(slots):
            n_ev = int(ev_counts[i])
            if n_ev:
                st.events = np.concatenate(
                    [st.events, ev_values[i, :n_ev]]
                )
            if n_ev < opt.min_events:
                # Reference quirk preserved (rmap.cpp:569-575): a chunk
                # below min_events is appended to the global event array
                # but reg->offset does NOT advance.
                continue
            chain_this_round[i] = True
            v = h_valid[i].ravel()
            tid = h_tid[i].ravel()[v]
            tpos = h_tpos[i].ravel()[v]
            strd = h_str[i].ravel()[v]
            qpos = h_qpos[i].ravel()[v].astype(np.int64) + st.offset
            seg = tid * 2 + strd
            if st.chains:
                prev_seg = []
                prev_t = []
                prev_q = []
                for ch in st.chains:
                    s = ch.reference_sequence_index * 2 + ch.strand
                    for t, q in ch.anchors:
                        prev_seg.append(s)
                        prev_t.append(int(t))
                        prev_q.append(int(q))
                seg = np.concatenate([seg, np.asarray(prev_seg, seg.dtype)])
                tpos = np.concatenate([tpos, np.asarray(prev_t, tpos.dtype)])
                qpos = np.concatenate([qpos, np.asarray(prev_q, qpos.dtype)])
            order = np.lexsort((qpos, tpos, seg))
            if order.size > A:
                self.counters["anchors_dropped"] += order.size - A
                order = order[:A]
            m = order.size
            seg_b[i, :m] = seg[order]
            tgt_b[i, :m] = tpos[order]
            qry_b[i, :m] = qpos[order]
            n_anch[i] = m
            st.offset += n_ev

        if not chain_this_round.any():
            for st in slots:
                st.chunk_ptr += L
                st.chunks_done += 1
            return

        # shrink the anchor axis to the smallest power-of-two bucket that
        # fits this round (one compile per bucket size)
        a_round = 16
        max_n_anch = int(n_anch.max())
        while a_round < max_n_anch:
            a_round *= 2
        a_round = min(a_round, A)
        dp = self._chain_dp(
            seg_b[:, :a_round],
            tgt_b[:, :a_round],
            qry_b[:, :a_round],
            n_anch,
        )
        scores = np.asarray(dp.scores)
        preds = np.asarray(dp.preds)

        # host traceback + DTW + decisions
        all_tiles: list[tuple[np.ndarray, np.ndarray, int, bool]] = []
        tile_owner: list[tuple[int, int]] = []  # (slot, chain idx)
        per_read_chains: dict[int, list[gchain.Chain]] = {}
        use_dtw = bool(
            opt.flag & (MappingFlag.DTW_EVALUATE_CHAINS | MappingFlag.DTW_LOG_SCORES)
        )
        for i, st in enumerate(slots):
            if not chain_this_round[i]:
                continue
            chains = postprocess.chains_from_dp(
                seg_b[i], tgt_b[i], qry_b[i], scores[i], preds[i],
                int(n_anch[i]), opt,
            )
            if use_dtw:
                chains.sort(key=lambda c: c.chaining_score, reverse=True)
                for ci, ch in enumerate(chains):
                    ref_ev = self._signals[ch.strand][
                        ch.reference_sequence_index
                    ]
                    ts = postprocess.build_chain_tiles(
                        ch, ref_ev, st.events, opt
                    )
                    for t in ts:
                        all_tiles.append(t)
                        tile_owner.append((i, ci))
            per_read_chains[i] = chains

        if use_dtw and all_tiles:
            batch = tiles.prepare_tiles(all_tiles)
            costs = tiles.dtw_banded(batch)
            self.counters["dtw_tiles"] += len(all_tiles)
            self.counters["dtw_cells"] += int(
                np.sum(
                    batch.a_len.astype(np.int64)
                    * np.minimum(
                        2 * batch.radius.astype(np.int64) + 1,
                        batch.b_len.astype(np.int64),
                    )
                )
            )
            # group costs per (slot, chain)
            cost_map: dict[tuple[int, int], list[float]] = {}
            for (owner, c) in zip(tile_owner, costs):
                cost_map.setdefault(owner, []).append(float(c))
            for i in list(per_read_chains):
                chains = per_read_chains[i]
                part_costs = [
                    np.asarray(cost_map.get((i, ci), []), dtype=np.float32)
                    for ci in range(len(chains))
                ]
                post = postprocess.bnb_replay(chains, part_costs, opt)
                if opt.flag & MappingFlag.DTW_EVALUATE_CHAINS:
                    per_read_chains[i] = post

        for i, st in enumerate(slots):
            st.chunk_ptr += L
            st.chunks_done += 1
            if not chain_this_round[i]:
                continue
            chains = per_read_chains.get(i, [])
            if chains:
                chains = gchain.gen_primary_chains(chains, opt)
                gchain.comp_mapq(chains, opt)
            st.chains = chains
            if self._decision(st):
                st.done = True

    # ------------------------------------------------------------------
    def _decision(self, st: _ReadState) -> bool:
        shim = gengine.ReadState(read_name=st.name)
        shim.chains = st.chains
        return gengine.is_mapped_with_high_confidence(shim, self.opt)

    # ------------------------------------------------------------------
    def _emit(self, st: _ReadState) -> paf.MappingResult:
        opt = self.opt
        self.counters["reads_processed"] += 1
        ci = max(st.chunks_done, 1)
        offset = st.offset if st.offset else 1
        scale = (float(ci) * opt.chunk_size / offset) / (
            float(opt.sample_rate) / opt.bp_per_sec
        )
        chains = st.chains
        n_anchors0 = chains[0].n_anchors if chains else 0
        mean_score = (
            sum(c.chaining_score for c in chains) / len(chains)
            if chains
            else 0.0
        )
        mapping_time_ms = st.map_time * 1000.0
        mapped = self._decision(st)
        if mapped:
            self.counters["reads_mapped"] += 1
            c0 = chains[0]
            if opt.flag & MappingFlag.DTW_OUTPUT_CIGAR:
                gchain.align_chain(
                    c0, self.index, st.events, opt, cigar=True
                )
            at = aq = 0.0
            for ai in range(n_anchors0 - 1):
                at += float(c0.anchors[ai][0]) - float(c0.anchors[ai + 1][0])
                aq += float(c0.anchors[ai][1]) - float(c0.anchors[ai + 1][1])
            at /= n_anchors0
            aq /= n_anchors0
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
                read_length=int(scale * c0.anchors[0][1]),
                mapped=True,
                read_start_position=int(scale * c0.anchors[n_anchors0 - 1][1]),
                read_end_position=int(scale * c0.anchors[0][1]),
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
            at = aq = 0.0
            for ai in range(n_anchors0 - 1):
                at += float(c0.anchors[ai][0]) - float(c0.anchors[ai + 1][0])
                aq += float(c0.anchors[ai][1]) - float(c0.anchors[ai + 1][1])
            if n_anchors0:
                at /= n_anchors0
                aq /= n_anchors0
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
            read_length=int(scale * st.offset),
            mapped=False,
            mapq=0,
            tags=tags,
        )
