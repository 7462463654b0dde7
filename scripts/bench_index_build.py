#!/usr/bin/env python
"""Index-build benchmark: round-1 algorithm vs the current build.

Matches the reference's parallel index construction story
(rawindex.cpp:99-250: 3-step kt_pipeline + kt_for over buckets) against
this framework's equivalents:

  legacy (round 1): serial per-sequence loop, one global 3-key
      np.lexsort over all (hash, id, ps) seeds;
  current: per-sequence thread pool (numpy + the native sketcher release
      the GIL), int32 k-mer rolling, ONE u64 radix sort per sequence of
      (hash<<32 | ps) packed seeds, and for multi-sequence references a
      single stable radix merge pass by hash.

Trials are INTERLEAVED (legacy, current, legacy, current, ...) because
this host has heavy, fluctuating hypervisor CPU steal — interleaving
exposes both variants to the same conditions; medians are reported.

Usage: python scripts/bench_index_build.py [--mb 50] [--seqs 1] [--trials 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rawalign_tpu import config, native
from rawalign_tpu.golden import sketch as gsketch
from rawalign_tpu.index import index as dindex
from rawalign_tpu.signal import seq2sig
from rawalign_tpu.testing import synth


def build_index_legacy(seqs, pore_vals, opt):
    """The round-1 build algorithm (serial loop + global np.lexsort),
    kept here as the benchmark baseline."""
    use_native = native.available()
    key_blocks, id_blocks, ps_blocks = [], [], []
    for rid, s in enumerate(seqs):
        codes = seq2sig.seq_to_codes(s.seq)
        sig1 = seq2sig.seq_to_sig(codes, pore_vals, opt.k, 1)
        sig0 = seq2sig.seq_to_sig(codes, pore_vals, opt.k, 0)
        for strand, sig in ((1, sig1), (0, sig0)):
            if not sig.size:
                continue
            if use_native:
                h, p = native.sketch_reg(sig, opt.e, opt.q, opt.lq)
            else:
                seeds = gsketch.sketch(
                    sig, rid, strand, opt.w, opt.e, opt.n, opt.q, opt.lq,
                    opt.k,
                )
                h = (
                    seeds[:, 0] >> np.uint64(gsketch.RI_HASH_SHIFT)
                ).astype(np.uint32)
                p = (
                    (seeds[:, 1] & np.uint64(0xFFFFFFFF))
                    >> np.uint64(gsketch.RI_POS_SHIFT)
                ).astype(np.int64)
            key_blocks.append(h.astype(np.uint32))
            id_blocks.append(np.full(h.size, rid, dtype=np.uint32))
            ps_blocks.append(
                (p.astype(np.uint32) << np.uint32(1)) | np.uint32(strand)
            )
    keys = np.concatenate(key_blocks)
    ids = np.concatenate(id_blocks)
    ps = np.concatenate(ps_blocks)
    order = np.lexsort((ps, ids, keys))
    return keys[order], ids[order], ps[order]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=float, default=50.0)
    ap.add_argument("--seqs", type=int, default=1)
    ap.add_argument("--trials", type=int, default=3)
    args = ap.parse_args()

    io = config.IndexOptions()
    per = int(args.mb * 1e6 / args.seqs)
    ds = synth.make_dataset(
        seed=5, genome_lengths=[per] * args.seqs, n_reads=1,
        read_len_bp=(400, 401),
    )
    legacy_t, new_t = [], []
    check = None
    for trial in range(args.trials):
        t0 = time.perf_counter()
        lk, li, lp = build_index_legacy(ds.seqs, ds.model.pore_vals, io)
        legacy_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
        new_t.append(time.perf_counter() - t0)
        if check is None:
            check = (
                np.array_equal(idx.keys, lk)
                and np.array_equal(idx.val_id, li)
                and np.array_equal(idx.val_ps, lp)
            )
        print(
            f"trial {trial}: legacy {legacy_t[-1]:.1f}s "
            f"current {new_t[-1]:.1f}s",
            file=sys.stderr,
        )
    med_l = float(np.median(legacy_t))
    med_n = float(np.median(new_t))
    print(
        json.dumps(
            {
                "genome_mb": args.mb,
                "n_seqs": args.seqs,
                "seeds": int(idx.keys.size),
                "legacy_median_s": round(med_l, 2),
                "current_median_s": round(med_n, 2),
                "speedup": round(med_l / med_n, 2),
                "tables_identical": bool(check),
                "host_note": "2 vCPUs with heavy fluctuating hypervisor "
                             "CPU steal; trials interleaved",
            }
        )
    )


if __name__ == "__main__":
    main()
