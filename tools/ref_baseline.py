#!/usr/bin/env python
"""Measure the REAL reference RawAlign binary end-to-end on the same
synthetic dataset bench.py uses, producing REF_BASELINE.json.

The binary is built by scripts/build_reference.sh (reference compute
code unmodified; signal IO shimmed to a plain binary container because
this environment has no HDF5 — see tools/refshim/rsig_shim.cpp).

This host has few cores, so the 32-thread baseline of BASELINE.md
cannot be run directly; we measure -t 1 and -t nproc and report
`reads_per_sec_32t_est = 32 * reads_per_sec_1t` — an upper bound that
ASSUMES perfect linear thread scaling (kthread work stealing is
sublinear in practice, so this favors the reference).

Usage: python tools/ref_baseline.py [--out REF_BASELINE.json]
"""

import argparse
import json
import os
import re
import struct
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUILD_DIR = os.environ.get("BUILD_DIR", "/tmp/ref_baseline")
BIN = os.path.join(BUILD_DIR, "src", "rawalign")


def digitize(sig, *, dig=8192.0, rng=1400.0, off=10.0):
    """Round-trip a float pA signal through the int16 DAC digitization
    the sraw/FAST5 writers apply, plus the reference's pA conversion and
    (30,200) clip (rsig.cpp:216-224; identical arithmetic in
    rsig_shim.cpp and io/fast5.py). Any parity comparison MUST feed the
    engine this, not the raw synth floats — the round-trip perturbs the
    event detector by ~1% of event boundaries, which round-3 parity
    numbers wrongly attributed to engine drift."""
    scale = rng / dig
    raw = np.round(np.asarray(sig, np.float64) / scale - off).astype(np.int16)
    pa = (raw.astype(np.float32) + np.float32(off)) * np.float32(
        np.float32(rng) / np.float32(dig)
    )
    return pa[(pa > 30) & (pa < 200)]


def write_sraw(path, reads, *, dig=8192.0, rng=1400.0, off=10.0):
    """Binary signal container read by tools/refshim/rsig_shim.cpp.

    Identical digitization to rawalign_tpu.io.fast5.write_fast5 so the
    reference binary and our engine see the same pA values.
    """
    scale = rng / dig
    with open(path, "wb") as f:
        f.write(b"SRAWBIN1")
        f.write(struct.pack("<I", len(reads)))
        for name, sig in reads:
            raw = np.round(np.asarray(sig, np.float64) / scale - off).astype(
                np.int16
            )
            nb = name.encode()
            f.write(struct.pack("<I", len(nb)))
            f.write(nb)
            f.write(struct.pack("<fffI", dig, rng, off, raw.size))
            f.write(raw.tobytes())


def run(cmd, **kw):
    t0 = time.perf_counter()
    p = subprocess.run(cmd, capture_output=True, text=True, **kw)
    dt = time.perf_counter() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-2000:])
        raise RuntimeError(f"command failed: {' '.join(cmd)}")
    return p, dt


def parse_times(stderr):
    """Index-load time and total real time from the reference's stderr."""
    t_idx = None
    t_tot = None
    m = re.search(r"loaded the index in ([0-9.]+) sec", stderr)
    if not m:
        m = re.search(
            r"\[M::main::([0-9.]+)\*[0-9.]+\].*(loaded|indexed)", stderr
        )
    if m:
        t_idx = float(m.group(1))
    m = re.search(r"Real time: ([0-9.]+) sec; CPU: ([0-9.]+) sec", stderr)
    if m:
        t_tot = float(m.group(1))
    return t_idx, t_tot


def score_paf(paf_text, ds):
    by_name = {r.name: r for r in ds.reads}
    n_mapped = 0
    n_correct = 0
    mt_ms = []
    for line in paf_text.splitlines():
        cols = line.split("\t")
        if len(cols) < 12:
            continue
        for c in cols[12:]:
            if c.startswith("mt:f:"):
                mt_ms.append(float(c[5:]))
        if cols[5] == "*":
            continue
        n_mapped += 1
        read = by_name.get(cols[0])
        if read is None or read.ref_id < 0:
            continue
        if (
            cols[5] == ds.seqs[read.ref_id].name
            and (cols[4] == "-") == bool(read.strand)
        ):
            lo, hi = int(cols[7]), int(cols[8])
            if not (hi < read.ref_start or lo > read.ref_end):
                n_correct += 1
    return n_mapped, n_correct, (float(np.mean(mt_ms)) if mt_ms else None)


def measure_scale(genome_kb: int, n_reads: int):
    """Build the synthetic dataset for one genome scale, index it with
    the reference binary, and measure mapping at -t 1 and -t nproc."""
    from rawalign_tpu.pore_model import save_pore_model
    from rawalign_tpu.io import fasta
    from rawalign_tpu.testing import synth

    data = os.path.join(BUILD_DIR, f"data_{genome_kb}kb")
    os.makedirs(data, exist_ok=True)
    ds = synth.make_dataset(
        seed=7,
        genome_lengths=[genome_kb * 1000],
        n_reads=n_reads,
        read_len_bp=(400, 1200),
        noise_pa=1.5,
    )
    ref_fa = os.path.join(data, "ref.fa")
    model_txt = os.path.join(data, "model.txt")
    sraw = os.path.join(data, "reads.fast5")
    fasta.write_fasta(ref_fa, [(s.name, s.seq) for s in ds.seqs])
    save_pore_model(model_txt, ds.model)
    write_sraw(sraw, [(r.name, r.signal) for r in ds.reads])

    ind = os.path.join(data, "ref.ind")
    nproc = os.cpu_count() or 1
    _, t_index = run(
        [BIN, "-x", "sensitive", "-t", str(nproc), "-d", ind, "-p",
         model_txt, ref_fa]
    )

    results = {}
    for t in sorted({1, nproc}):
        best = None
        for _ in range(2):  # take best-of-2 (page cache warm)
            p, dt = run(
                [BIN, "-x", "sensitive", "--dtw-evaluate-chains",
                 "-t", str(t), ind, sraw]
            )
            t_idx, t_tot = parse_times(p.stderr)
            map_s = (t_tot - t_idx) if (t_idx and t_tot) else dt
            if best is None or map_s < best[0]:
                best = (map_s, p)
        map_s, p = best
        n_mapped, n_correct, mt_mean = score_paf(p.stdout, ds)
        results[t] = {
            "mapping_wall_s": round(map_s, 3),
            "reads_per_sec": round(n_reads / map_s, 2),
            "mapped_frac": round(n_mapped / n_reads, 3),
            "correct_frac": round(n_correct / n_reads, 3),
            "mean_mt_ms": round(mt_mean, 2) if mt_mean else None,
        }
    return {
        "n_reads": n_reads,
        "genome_kb": genome_kb,
        "index_build_s": round(t_index, 2),
        "by_threads": results,
        "reads_per_sec_1t": results[1]["reads_per_sec"],
        "reads_per_sec_32t_est": round(32 * results[1]["reads_per_sec"], 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--n-reads", type=int, default=256)
    ap.add_argument("--genome-kb", type=int, default=200)
    ap.add_argument(
        "--scales",
        default=None,
        help="comma list of extra GENOME_KB[:N_READS] scales to measure "
             "beyond the primary (e.g. '5000:256,50000:128')",
    )
    args = ap.parse_args()

    if not os.path.exists(BIN):
        print(f"reference binary not found at {BIN}; run "
              "scripts/build_reference.sh first", file=sys.stderr)
        return 1

    nproc = os.cpu_count() or 1
    primary = measure_scale(args.genome_kb, args.n_reads)
    scales = {f"{args.genome_kb}kb": primary}
    if args.scales:
        for spec in args.scales.split(","):
            kb, _, nr = spec.partition(":")
            kb = int(kb)
            nr = int(nr) if nr else args.n_reads
            scales[f"{kb}kb"] = measure_scale(kb, nr)

    out = {
        "binary": BIN,
        "dataset": {
            "n_reads": args.n_reads,
            "genome_kb": args.genome_kb,
            "seed": 7,
            "config": "sensitive + --dtw-evaluate-chains (defaults: "
                      "sparse border, banded 0.10)",
        },
        "host_nproc": nproc,
        "index_build_s": primary["index_build_s"],
        "by_threads": primary["by_threads"],
        "reads_per_sec_1t": primary["reads_per_sec_1t"],
        "reads_per_sec_32t_est": primary["reads_per_sec_32t_est"],
        "scales": scales,
        "est_note": "32t estimate assumes perfect linear scaling from 1 "
                    "thread (favors the reference; kthread is sublinear)",
    }
    print(json.dumps(out, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
