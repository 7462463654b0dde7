"""Microbench: fused Pallas DTW kernel throughput on the production tile mix.

Usage: python scripts/microbench_dtw.py [n_tiles] [iters] [trials] [--out F]
Prints per-trial cells/sec (repeated trials expose the tunnel's
variance — VERDICT r3 item 7 pins this as a per-round artifact), writes
a JSON record when --out is given, and checks results against the
golden implementation.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
        if out_path in args:
            args.remove(out_path)
    n_tiles = int(args[0]) if len(args) > 0 else 4096
    iters = int(args[1]) if len(args) > 1 else 20
    trials = int(args[2]) if len(args) > 2 else 5
    import jax

    from rawalign_tpu import runtime

    runtime.enable_compilation_cache()
    from rawalign_tpu.map import dtw_pallas, tiles

    rng = np.random.default_rng(0)
    pairs = []
    for _ in range(n_tiles):
        al = int(rng.integers(8, 96))
        bl = max(1, int(al * rng.uniform(0.7, 1.4)))
        a = rng.normal(0, 1, al).astype(np.float32)
        b = rng.normal(0, 1, bl).astype(np.float32)
        pairs.append((a, b, max(1, int(al * 0.10)), True))

    interpret = jax.default_backend() == "cpu"
    by_class = {}
    for p in pairs:
        n = max(p[0].size, p[1].size)
        c = max(32, ((n + 31) // 32) * 32)
        by_class.setdefault(c, []).append(p)
    flat = []
    metas = []
    corrs = []
    cells = 0
    for c in sorted(by_class):
        batch = tiles.prepare_tiles(by_class[c])
        cells += int(
            np.sum(
                batch.a_len.astype(np.int64)
                * np.minimum(
                    2 * batch.radius.astype(np.int64) + 1,
                    batch.b_len.astype(np.int64),
                )
            )
        )
        args, corr = tiles.pallas_inputs(batch)
        flat.extend(jax.device_put(x) for x in args)
        metas.append((batch.dpw, batch.max_n))
        corrs.append(corr)
    flat = tuple(flat)
    metas = tuple(metas)
    t0 = time.perf_counter()
    outs = dtw_pallas.dtw_banded_multi(flat, metas=metas, interpret=interpret)
    jax.block_until_ready(outs)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s  metas={metas}")
    # repeated trials: the tunneled link stalls for seconds at a time,
    # so a single measurement is meaningless — report the distribution
    # (block_until_ready on axon can return early; a real device_get of
    # the last output forces completion)
    gcps = []
    for _t in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            outs = dtw_pallas.dtw_banded_multi(
                flat, metas=metas, interpret=interpret
            )
        _ = np.asarray(outs[-1][:1])
        dt = (time.perf_counter() - t0) / iters
        gcps.append(cells / dt / 1e9)
        print(f"trial {_t}: t={dt * 1e3:.2f} ms  {gcps[-1]:.2f} Gcells/s")
    gs = sorted(gcps)
    med = gs[len(gs) // 2]
    print(
        f"cells={cells}  Gcells/s min={gs[0]:.2f} median={med:.2f} "
        f"max={gs[-1]:.2f}"
    )
    if out_path:
        import json

        with open(out_path, "w") as f:
            json.dump(
                {
                    "n_tiles": n_tiles,
                    "iters": iters,
                    "trials": trials,
                    "cells_per_dispatch": cells,
                    "gcells_per_sec": [round(g, 2) for g in gcps],
                    "median_gcells_per_sec": round(med, 2),
                    "max_gcells_per_sec": round(gs[-1], 2),
                    "note": (
                        "max is the best observable on the tunneled dev "
                        "link; median includes tunnel stalls — see "
                        "PROGRESS.md environment notes"
                    ),
                },
                f,
                indent=1,
            )

    # correctness vs golden on a sample
    from rawalign_tpu.golden import dtw as gdtw

    got = []
    for k, c in enumerate(sorted(by_class)):
        vals = np.asarray(outs[k]) - corrs[k]
        got.extend(vals[: len(by_class[c])])
    flat_pairs = [p for c in sorted(by_class) for p in by_class[c]]
    idx = rng.choice(len(flat_pairs), size=min(64, len(flat_pairs)), replace=False)
    bad = 0
    for i in idx:
        a, b, r, ex = flat_pairs[i]
        want = gdtw.dtw_global_slantedbanded_antidiagonalwise(a, b, r, ex)
        if not np.isclose(got[i], want, atol=1e-3):
            bad += 1
            if bad < 4:
                print(f"MISMATCH tile {i}: got {got[i]} want {want}")
    print(f"checked {len(idx)} tiles, {bad} mismatches")


if __name__ == "__main__":
    main()
