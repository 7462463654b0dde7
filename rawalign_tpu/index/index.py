"""The seed index: build (host), query (device), serialization.

TPU-first redesign of the reference's bucketed khash index
(src/rawindex.cpp:194-273): one flat table of all seeds sorted by
(hash, y), queried with vectorized binary search + bounded gather. This
replaces pointer-chasing hash lookups with two ``searchsorted`` passes and
a contiguous gather — bandwidth-friendly and fully batched, and it
produces the reference's exact hit lists in the same order (the reference
radix-sorts each hash's positions by y, rawindex.cpp:233).

Device layout (all uint32/int32 — TPUs have no native 64-bit int):
  keys   (S,)  uint32  sorted seed hashes
  val_id (S,)  uint32  target sequence id
  val_ps (S,)  uint32  pos<<1 | strand

The index also carries the full per-sequence expected signal arrays,
concatenated with per-sequence offsets (the reference stores them per
sequence, rawindex.h:32-34) — required by the DTW chain evaluation.

On-disk format: a single .npz (RAWALIGN_TPU_IDX v1) holding the tables,
the signals and the build parameters (the reference embeds w,e,q,lq,k in
its binary dump too, rawindex.cpp:277-282).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from rawalign_tpu.config import IndexOptions
from rawalign_tpu.golden import sketch as gsketch
from rawalign_tpu.io.fasta import Sequence
from rawalign_tpu.signal import seq2sig

MAGIC = "RAWALIGN_TPU_IDX_V1"


@dataclasses.dataclass
class RawIndex:
    """Host-resident index; .device() uploads the query tables."""

    opt: IndexOptions
    seq_names: list[str]
    seq_lens: np.ndarray  # (n_seq,) uint32 bp lengths
    sig_lens: np.ndarray  # (n_seq,) uint32 signal lengths
    sig_offsets: np.ndarray  # (n_seq+1,) int64 offsets into concat signals
    # concatenated expected signals; index by strand bit (1 = the
    # reference's "forward_signals" built with strand-1 conversion)
    signals_s1: np.ndarray  # float32 (total_sig,)
    signals_s0: np.ndarray  # float32 (total_sig,)
    keys: np.ndarray  # (S,) uint32 sorted
    val_id: np.ndarray  # (S,) uint32
    val_ps: np.ndarray  # (S,) uint32  pos<<1|strand

    @property
    def n_seq(self) -> int:
        return len(self.seq_names)

    # ---- golden-compatible accessors (used by the golden engine/tests)
    @property
    def signals(self):
        out = {0: [], 1: []}
        for i in range(self.n_seq):
            lo, hi = self.sig_offsets[i], self.sig_offsets[i + 1]
            out[0].append(self.signals_s0[lo:hi])
            out[1].append(self.signals_s1[lo:hi])
        return out

    def get(self, hashval: int) -> np.ndarray:
        """All y values for a hash, ascending (ri_idx_get semantics)."""
        h = np.uint32(hashval)
        lo = np.searchsorted(self.keys, h, side="left")
        hi = np.searchsorted(self.keys, h, side="right")
        return (
            (self.val_id[lo:hi].astype(np.uint64) << np.uint64(32))
            | self.val_ps[lo:hi].astype(np.uint64)
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            magic=np.array(MAGIC),
            params=np.array(
                [
                    self.opt.b,
                    self.opt.w,
                    self.opt.e,
                    self.opt.n,
                    self.opt.q,
                    self.opt.lq,
                    self.opt.k,
                    self.opt.flag,
                ],
                dtype=np.int64,
            ),
            seq_names=np.array(self.seq_names),
            seq_lens=self.seq_lens,
            sig_lens=self.sig_lens,
            sig_offsets=self.sig_offsets,
            signals_s1=self.signals_s1,
            signals_s0=self.signals_s0,
            keys=self.keys,
            val_id=self.val_id,
            val_ps=self.val_ps,
        )

    @staticmethod
    def load(path: str) -> "RawIndex":
        z = np.load(path, allow_pickle=False)
        if str(z["magic"]) != MAGIC:
            raise ValueError(f"{path}: not a {MAGIC} index")
        p = z["params"]
        opt = IndexOptions(
            b=int(p[0]),
            w=int(p[1]),
            e=int(p[2]),
            n=int(p[3]),
            q=int(p[4]),
            lq=int(p[5]),
            k=int(p[6]),
            flag=int(p[7]),
        )
        return RawIndex(
            opt=opt,
            seq_names=[str(s) for s in z["seq_names"]],
            seq_lens=z["seq_lens"],
            sig_lens=z["sig_lens"],
            sig_offsets=z["sig_offsets"],
            signals_s1=z["signals_s1"],
            signals_s0=z["signals_s0"],
            keys=z["keys"],
            val_id=z["val_id"],
            val_ps=z["val_ps"],
        )


def build_index(
    seqs: list[Sequence], pore_vals: np.ndarray, opt: IndexOptions
) -> RawIndex:
    """Host-side index build (replaces ri_idx_gen + ri_idx_post,
    rawindex.cpp:99-250): per sequence, expected-signal conversion on both
    strands + sketching, then one global lexsort."""
    from rawalign_tpu import native

    use_native = native.available()
    names: list[str] = []
    lens: list[int] = []
    sig_lens: list[int] = []
    sigs1: list[np.ndarray] = []
    sigs0: list[np.ndarray] = []
    key_blocks: list[np.ndarray] = []
    id_blocks: list[np.ndarray] = []
    ps_blocks: list[np.ndarray] = []
    for rid, s in enumerate(seqs):
        names.append(s.name)
        lens.append(len(s.seq))
        codes = seq2sig.seq_to_codes(s.seq)
        sig1 = seq2sig.seq_to_sig(codes, pore_vals, opt.k, 1)
        sig0 = seq2sig.seq_to_sig(codes, pore_vals, opt.k, 0)
        sigs1.append(sig1)
        sigs0.append(sig0)
        sig_lens.append(sig1.size)
        for strand, sig in ((1, sig1), (0, sig0)):
            if not sig.size:
                continue
            if use_native:
                if opt.w:
                    h, p = native.sketch_min(sig, opt.w, opt.e, opt.q, opt.lq)
                else:
                    h, p = native.sketch_reg(sig, opt.e, opt.q, opt.lq)
            else:
                seeds = gsketch.sketch(
                    sig, rid, strand, opt.w, opt.e, opt.n, opt.q, opt.lq, opt.k
                )
                h = (seeds[:, 0] >> np.uint64(gsketch.RI_HASH_SHIFT)).astype(
                    np.uint32
                )
                p = (
                    (seeds[:, 1] & np.uint64(0xFFFFFFFF))
                    >> np.uint64(gsketch.RI_POS_SHIFT)
                ).astype(np.int64)
            key_blocks.append(h.astype(np.uint32))
            id_blocks.append(np.full(h.size, rid, dtype=np.uint32))
            ps_blocks.append(
                ((p.astype(np.uint32) << np.uint32(1)) | np.uint32(strand))
            )
    if key_blocks:
        keys = np.concatenate(key_blocks)
        ids = np.concatenate(id_blocks)
        ps = np.concatenate(ps_blocks)
    else:
        keys = np.zeros(0, np.uint32)
        ids = np.zeros(0, np.uint32)
        ps = np.zeros(0, np.uint32)
    # sort by (hash, id, pos<<1|strand) == the reference's per-hash
    # position order (rawindex.cpp:233)
    order = np.lexsort((ps, ids, keys))
    offsets = np.zeros(len(seqs) + 1, dtype=np.int64)
    np.cumsum(sig_lens, out=offsets[1:])
    return RawIndex(
        opt=opt,
        seq_names=names,
        seq_lens=np.asarray(lens, dtype=np.uint32),
        sig_lens=np.asarray(sig_lens, dtype=np.uint32),
        sig_offsets=offsets,
        signals_s1=(
            np.concatenate(sigs1) if sigs1 else np.zeros(0, np.float32)
        ),
        signals_s0=(
            np.concatenate(sigs0) if sigs0 else np.zeros(0, np.float32)
        ),
        keys=keys[order],
        val_id=ids[order],
        val_ps=ps[order],
    )
