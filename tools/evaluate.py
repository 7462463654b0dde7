#!/usr/bin/env python
"""End-to-end evaluation driver: dataset -> index -> map -> metrics.

Mirrors the reference's per-dataset evaluation scripts
(test/evaluation/read_mapping/*/run_rawalign_banded_sparse.sh): maps a
dataset under a named configuration and reports accuracy + throughput.
Supports the same first-class parameter sweeps as the reference
(band-radius fraction, match bonus, dtw-min-score;
run_rawalign_banded_sparse.sh:5-25).

    python tools/evaluate.py DATASET_DIR --preset viral --config banded_sparse
    python tools/evaluate.py DATASET_DIR --sweep band-radius \
        --values 0.05 0.10 0.15 0.20
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.compare_pafs import evaluate as compare_evaluate, load_truth_tsv

CONFIGS = {
    # mirrors of the reference eval configurations (0_run_all.sh:12-19)
    "chaining_only": [],
    "full_global": [
        "--dtw-evaluate-chains",
        "--dtw-border-constraint", "global",
        "--dtw-fill-method", "full",
    ],
    "banded_global": [
        "--dtw-evaluate-chains",
        "--dtw-border-constraint", "global",
        "--dtw-fill-method", "banded=0.10",
    ],
    "full_sparse": [
        "--dtw-evaluate-chains",
        "--dtw-border-constraint", "sparse",
        "--dtw-fill-method", "full",
    ],
    "banded_sparse": [
        "--dtw-evaluate-chains",
        "--dtw-border-constraint", "sparse",
        "--dtw-fill-method", "banded=0.10",
        "--dtw-match-bonus", "0.4",
        "--dtw-min-score", "20.0",
    ],
}


def run_one(dataset, preset, extra_args, out_paf, engine="device",
            mt_mode="share"):
    from rawalign_tpu import cli

    ref = os.path.join(dataset, "ref.fa")
    model = os.path.join(dataset, "model.txt")
    idx = os.path.join(dataset, "ref.idx.npz")
    reads = os.path.join(dataset, "reads.fast5")
    if not os.path.exists(idx):
        rc = cli.main(["-x", preset, "-p", model, "-d", idx, ref])
        assert rc == 0
    t0 = time.time()
    mt = ["--mt-mode", mt_mode] if engine == "device" else []
    rc = cli.main(
        ["-x", preset, "--engine", engine, "-o", out_paf, *mt,
         *extra_args, idx, reads]
    )
    assert rc == 0
    return time.time() - t0


def run_abundance(args) -> int:
    """Map the dataset and compare estimated relative abundance (mapped
    fragment bases per reference) against the ground truth composition."""
    import collections

    truth = load_truth_tsv(os.path.join(args.dataset, "truth.tsv"))
    out_paf = os.path.join(args.dataset, "out_abundance.paf")
    extra = CONFIGS["banded_sparse"] + ["--stop-min-anchor", "2"]
    run_one(args.dataset, args.preset, extra, out_paf, args.engine)
    est = collections.Counter()
    with open(out_paf) as f:
        for line in f:
            fields = line.rstrip("\n").split("\t")
            if len(fields) > 8 and fields[2] != "*":
                est[fields[5]] += int(fields[8]) - int(fields[7])
    true_bp = collections.Counter()
    for name, (ref, strand, start, end) in truth.items():
        if ref != "*":
            true_bp[ref] += end - start
    total_e = sum(est.values()) or 1
    total_t = sum(true_bp.values()) or 1
    refs = sorted(set(est) | set(true_bp))
    print("ref\test_abundance\ttrue_abundance\terror")
    max_err = 0.0
    for r in refs:
        e = est[r] / total_e
        t = true_bp[r] / total_t
        max_err = max(max_err, abs(e - t))
        print(f"{r}\t{e:.4f}\t{t:.4f}\t{abs(e - t):.4f}")
    print(f"# max_abs_error\t{max_err:.4f}")
    return 0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--preset", default="viral")
    ap.add_argument("--config", default="banded_sparse", choices=CONFIGS)
    ap.add_argument("--engine", default="device", choices=["device", "golden"])
    ap.add_argument(
        "--mt-mode", default="share", choices=["share", "wall"],
        help="mt:f semantics for the device engine: 'share' = amortized "
        "round share, 'wall' = strict per-read wall across live rounds "
        "(the reference's rmap.cpp:684-694 semantics)",
    )
    ap.add_argument(
        "--sweep", choices=["band-radius", "match-bonus", "dtw-min-score"]
    )
    ap.add_argument("--values", type=float, nargs="+")
    ap.add_argument("--json", action="store_true")
    ap.add_argument(
        "--abundance",
        action="store_true",
        help="relative-abundance workload: report estimated vs true "
        "per-reference abundance (the reference's "
        "table_relative_abundance.py analog)",
    )
    args = ap.parse_args()

    if args.abundance:
        return run_abundance(args)

    truth = load_truth_tsv(os.path.join(args.dataset, "truth.tsv"))
    rows = []
    if args.sweep:
        flag = {
            "band-radius": None,
            "match-bonus": "--dtw-match-bonus",
            "dtw-min-score": "--dtw-min-score",
        }[args.sweep]
        for v in args.values or [0.05, 0.10, 0.15]:
            extra = [
                "--dtw-evaluate-chains",
                "--dtw-border-constraint", "sparse",
            ]
            if args.sweep == "band-radius":
                extra += ["--dtw-fill-method", f"banded={v}"]
            else:
                extra += ["--dtw-fill-method", "banded=0.10", flag, str(v)]
            out_paf = os.path.join(
                args.dataset, f"out_{args.sweep}_{v}.paf"
            )
            wall = run_one(args.dataset, args.preset, extra, out_paf,
                           args.engine, args.mt_mode)
            m = compare_evaluate(out_paf, truth)
            m["sweep_value"] = v
            m["wall_s"] = round(wall, 2)
            rows.append(m)
    else:
        out_paf = os.path.join(args.dataset, f"out_{args.config}.paf")
        wall = run_one(
            args.dataset, args.preset, CONFIGS[args.config], out_paf,
            args.engine, args.mt_mode,
        )
        m = compare_evaluate(out_paf, truth)
        m["config"] = args.config
        m["wall_s"] = round(wall, 2)
        rows.append(m)

    # mean/median time-per-read here comes from the mt:f PAF tag, which
    # in this batched engine is the read's AMORTIZED share of each
    # round's wall time (engine.py charge_round), not the reference's
    # per-read wall clock (rmap.cpp:684-694) — comparable in aggregate,
    # not read-by-read (tests/test_mt_semantics.py).
    if args.engine == "golden" or args.mt_mode == "wall":
        mt_note = (
            "mt:f is per-read wall time across the read's live rounds "
            "(the reference's rmap.cpp:684-694 semantics; for the "
            "batched engine this double-counts shared batch cost)"
        )
    else:
        mt_note = (
            "mt:f is amortized round share (batched engine), not per-read "
            "wall time as in the reference; compare aggregates only "
            "(rerun with --mt-mode wall for strict reference semantics)"
        )
    for r in rows:
        r["mt_semantics"] = mt_note
    if args.json:
        print(json.dumps(rows))
    else:
        keys = [k for k in rows[0] if k != "mt_semantics"]
        print(f"# {mt_note}")
        print("\t".join(keys))
        for r in rows:
            print(
                "\t".join(
                    f"{r[k]:.4f}" if isinstance(r[k], float) else str(r[k])
                    for k in keys
                )
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
