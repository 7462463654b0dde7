#!/usr/bin/env python
"""Probe: wavefront unroll depth sweep per band-width class (round 5).

The grid-step overhead (~2us/step regardless of dpw, round-4 probe)
means narrow-band classes are step-count-bound: deeper unrolls should
keep winning until register pressure bites. Pre-warms EVERY variant
before any timed window (remote compiles cost minutes), then runs
interleaved trials.

Usage: python scripts/probe_dtw_unroll.py [--out docs/dtw_unroll_r5.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_class(rng, lo, hi, n_tiles):
    from rawalign_tpu.map import tiles

    pairs = []
    for _ in range(n_tiles):
        al = int(rng.integers(lo, hi))
        bl = max(1, int(al * rng.uniform(0.7, 1.4)))
        a = rng.normal(0, 1, al).astype(np.float32)
        b = rng.normal(0, 1, bl).astype(np.float32)
        pairs.append((a, b, max(1, int(al * 0.10)), True))
    batch = tiles.prepare_tiles(pairs)
    cells = int(
        np.sum(
            batch.a_len.astype(np.int64)
            * np.minimum(
                2 * batch.radius.astype(np.int64) + 1,
                batch.b_len.astype(np.int64),
            )
        )
    )
    args, _ = tiles.pallas_inputs(batch)
    return batch, args, cells


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--tiles", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trials", type=int, default=4)
    args = ap.parse_args()
    import jax

    from rawalign_tpu import runtime
    from rawalign_tpu.map import dtw_pallas

    runtime.enable_compilation_cache()
    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)
    # production-like classes: (a_len range, unroll candidates)
    classes = {
        "c32": ((8, 32), (1, 2, 4, 8)),
        "c64": ((33, 64), (1, 2, 4, 8)),
        "c128": ((65, 128), (2, 4, 8)),
    }
    staged = {}
    for name, ((lo, hi), unrolls) in classes.items():
        batch, kargs, cells = make_class(rng, lo, hi, args.tiles)
        dev_args = tuple(jax.device_put(x) for x in kargs)
        staged[name] = (batch, dev_args, cells, unrolls)
    # pre-warm EVERY variant in one sweep (compiles are cached on disk)
    t0 = time.perf_counter()
    for name, (batch, dev_args, cells, unrolls) in staged.items():
        for u in unrolls:
            out = dtw_pallas.dtw_banded_batch_pallas(
                *dev_args, dpw=batch.dpw, max_n=batch.max_n,
                interpret=interpret, unroll=u,
            )
            _ = np.asarray(out[:1])
    print(f"warm: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    results = {}
    baseline_out = {}
    for name, (batch, dev_args, cells, unrolls) in staged.items():
        results[name] = {
            "dpw": batch.dpw, "max_n": batch.max_n, "cells": cells,
            "gcps_by_unroll": {},
        }
    for _t in range(args.trials):
        for name, (batch, dev_args, cells, unrolls) in staged.items():
            for u in unrolls:  # interleaved within a trial
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = dtw_pallas.dtw_banded_batch_pallas(
                        *dev_args, dpw=batch.dpw, max_n=batch.max_n,
                        interpret=interpret, unroll=u,
                    )
                host = np.asarray(out)  # force completion
                dt = (time.perf_counter() - t0) / args.iters
                g = cells / dt / 1e9
                d = results[name]["gcps_by_unroll"].setdefault(str(u), [])
                d.append(round(g, 3))
                ref = baseline_out.setdefault(name, host)
                assert np.array_equal(ref, host), (name, u)  # bit-exact
    for name in results:
        best = {
            u: max(v) for u, v in results[name]["gcps_by_unroll"].items()
        }
        results[name]["best"] = best
        print(name, results[name]["dpw"], best, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
