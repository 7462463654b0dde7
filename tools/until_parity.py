#!/usr/bin/env python
"""Sequence Until side-by-side vs the reference binary (VERDICT r4 #4).

Runs the fpexact reference binary with ``-x sequence-until
--sequence-until`` on an abundance workload and our CLI (golden engine —
byte-exact twin of the device engine) with the same preset/flags on the
same digitized signals, then compares:

- the stop point (mapped-read count in the stderr activation message,
  rmap.cpp:936-938)
- every PAF line byte-for-byte (mt:f excluded), including the post-stop
  forced-unmapped lines (rmap.cpp:960-964)
- the final relative-abundance estimate (ours) vs the binary's mapped
  fragment accounting recomputed from its own PAF

The su thresholds are lowered (--min-reads/--test-frequency) so the stop
fires mid-run on a 256-read set; the preset's 750M mini-batch means the
binary processes everything in ONE pipeline batch, so post-stop reads
keep their real tags — the same transformation our CLI applies.

Usage: python tools/until_parity.py --out docs/until_parity_r5.json
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ref_baseline import BUILD_DIR, write_sraw  # noqa: E402
from tools.ref_parity import FPEXACT_BIN, strip_mt  # noqa: E402

SU_ARGS = ["--min-reads", "40", "--test-frequency", "10", "--n-samples", "5"]
_STOP = re.compile(r"stopping sequencing after processing (\d+) mapped reads")


def make_data():
    from rawalign_tpu.io import fasta, fast5
    from rawalign_tpu.pore_model import save_pore_model
    from rawalign_tpu.testing import synth

    data = os.path.join(BUILD_DIR, "data_until")
    os.makedirs(data, exist_ok=True)
    ds = synth.make_dataset(
        seed=11,
        genome_lengths=[120_000, 60_000, 20_000],
        n_reads=256,
        read_len_bp=(400, 1200),
        noise_pa=1.5,
    )
    ref_fa = os.path.join(data, "ref.fa")
    model_txt = os.path.join(data, "model.txt")
    sraw = os.path.join(data, "reads_sraw.fast5")
    f5 = os.path.join(data, "reads_h5.fast5")
    if not os.path.exists(ref_fa):
        fasta.write_fasta(ref_fa, [(s.name, s.seq) for s in ds.seqs])
        save_pore_model(model_txt, ds.model)
    if not os.path.exists(sraw):
        # zero-padded names: sequence-until is ORDER-sensitive (the stop
        # point depends on read order), the sraw shim preserves insertion
        # order, and h5py iterates multi-read groups lexicographically —
        # sortable names make both sides process the same sequence
        reads = [(f"read{i:04d}", r.signal) for i, r in enumerate(ds.reads)]
        write_sraw(sraw, reads)
        fast5.write_fast5(f5, reads)
    return data, ref_fa, model_txt, sraw, f5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not os.path.exists(FPEXACT_BIN):
        print("fpexact binary missing; run scripts/build_reference_fpexact.sh",
              file=sys.stderr)
        return 1
    data, ref_fa, model_txt, sraw, f5 = make_data()

    ind = os.path.join(data, "ref_su.ind")
    if not os.path.exists(ind):
        subprocess.run(
            [FPEXACT_BIN, "-x", "sequence-until", "-t", "1", "-d", ind,
             "-p", model_txt, ref_fa],
            check=True, capture_output=True,
        )

    def abundance(lines):
        counts: dict[str, int] = {}
        for ln in lines:
            c = ln.split("\t")
            if len(c) >= 12 and c[5] != "*":
                counts[c[5]] = counts.get(c[5], 0) + int(c[10])
        tot = max(sum(counts.values()), 1)
        return {k: round(v / tot, 6) for k, v in sorted(counts.items())}

    def run_one(tag, su_args):
        rp = subprocess.run(
            [FPEXACT_BIN, "-x", "sequence-until", "--sequence-until",
             "--dtw-evaluate-chains", *su_args, "-t", "1", ind, sraw],
            check=True, capture_output=True, text=True,
        )
        m = _STOP.search(rp.stderr)
        ref_stop = int(m.group(1)) if m else None

        out_paf = os.path.join(data, f"ours_{tag}.paf")
        op = subprocess.run(
            [sys.executable, "-m", "rawalign_tpu.cli",
             "-x", "sequence-until", "--sequence-until",
             "--dtw-evaluate-chains", *su_args, "--engine", "golden",
             "-o", out_paf, ind, f5],
            check=True, capture_output=True, text=True,
            cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))
            ),
        )
        m = _STOP.search(op.stderr)
        our_stop = int(m.group(1)) if m else None
        with open(out_paf) as f:
            our_lines = strip_mt(f.read()).splitlines()
        ref_lines = strip_mt(rp.stdout).splitlines()

        n = max(len(ref_lines), len(our_lines), 1)
        ident = sum(1 for a, b in zip(ref_lines, our_lines) if a == b)
        return {
            "n_reads": 256,
            "ref_stop_mapped_reads": ref_stop,
            "our_stop_mapped_reads": our_stop,
            "stop_agrees": ref_stop == our_stop,
            "lines_ref": len(ref_lines),
            "lines_ours": len(our_lines),
            "byte_identical_frac": round(ident / n, 4),
            "post_stop_lines_ref": sum(
                1 for ln in ref_lines if "\t*\t*\t" in ln
            ),
            "ref_abundance": abundance(ref_lines),
            "our_abundance": abundance(our_lines),
            "su_args": su_args,
        }

    res = {
        # stop fires at the first test opportunity (stable abundance)
        "first_opportunity": run_one("first", SU_ARGS),
        # tighter threshold: convergence below 2e-4 squared distance
        # takes more estimation rounds -> the stop fires mid-run later
        "late_stop": run_one(
            "late", SU_ARGS + ["--threshold", "0.0002"]
        ),
    }
    print(json.dumps(res, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=2)
    ok = all(
        r["stop_agrees"] and r["byte_identical_frac"] == 1.0
        for r in res.values()
    )
    return 0 if ok else 2


if __name__ == "__main__":
    raise SystemExit(main())
