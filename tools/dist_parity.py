#!/usr/bin/env python
"""Distributed-engine parity at 5Mb scale (VERDICT r4 #3 artifact).

Runs DistributedMappingEngine on an 8-device VIRTUAL CPU mesh over a
subset of the 5Mb ref_parity dataset — the scale whose key multiplicity
(max 1738) used to flood the old fixed anchor shapes — and byte-compares
its PAF against the fpexact reference binary's lines for the same reads
(the single-device engine is byte-identical to the binary at this scale,
docs/ref_parity_r5.json, so binary parity == single-device parity).
Asserts anchors_dropped == 0: the device chain path's pow2 width
escalation replaces decimation.

Usage: python tools/dist_parity.py --n-reads 64 --out docs/dist_parity_r5.json
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

_MT = re.compile(r"\tmt:f:[^\t\n]*")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-reads", type=int, default=64)
    ap.add_argument("--genome-kb", type=int, default=5000)
    ap.add_argument("--layouts", default="4x2,2x4")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from tools.ref_parity import FPEXACT_BIN, binary_map, make_data
    from rawalign_tpu import config
    from rawalign_tpu.config import MappingFlag
    from rawalign_tpu.index import index as dindex
    from rawalign_tpu.io import paf
    from rawalign_tpu.parallel import mesh as pmesh
    from rawalign_tpu.parallel.dist_engine import DistributedMappingEngine
    from tools.ref_baseline import digitize

    data, ds, ref_fa, model_txt, sraw, ind = make_data(args.genome_kb, 256)
    ind_fp = os.path.join(data, "ref_fpexact.ind")
    if not os.path.exists(ind_fp):
        import subprocess

        subprocess.run(
            [FPEXACT_BIN, "-x", "sensitive", "-t", "2", "-d", ind_fp,
             "-p", model_txt, ref_fa],
            check=True, capture_output=True,
        )
    ref_paf = binary_map(ind_fp, sraw, FPEXACT_BIN)
    ref_by_name = {
        ln.split("\t")[0]: _MT.sub("", ln)
        for ln in ref_paf.splitlines()
    }

    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    reads = [
        (r.name, digitize(r.signal)) for r in ds.reads[: args.n_reads]
    ]

    results = {"genome_kb": args.genome_kb, "n_reads": args.n_reads,
               "layouts": {}}
    ok_all = True
    for spec in args.layouts.split(","):
        d, s = (int(x) for x in spec.split("x"))
        mesh = pmesh.make_mesh(d, s)
        eng = DistributedMappingEngine(idx, mo, mesh, batch_size=16)
        lines = {
            r.read_name: _MT.sub("", paf.paf_line(r))
            for r in eng.map_reads(iter(reads))
        }
        ident = sum(
            1 for nm, ln in lines.items() if ref_by_name.get(nm) == ln
        )
        row = {
            "byte_identical": ident,
            "byte_identical_frac": round(ident / max(len(lines), 1), 4),
            "anchors_dropped": int(eng.counters["anchors_dropped"]),
            "seed_hits_dropped": int(eng.counters["seed_hits_dropped"]),
        }
        results["layouts"][spec] = row
        print(spec, json.dumps(row), flush=True)
        ok_all &= row["byte_identical_frac"] == 1.0 and (
            row["anchors_dropped"] == 0
        )
        eng.close()
    results["ok"] = ok_all
    print(json.dumps(results))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0 if ok_all else 2


if __name__ == "__main__":
    raise SystemExit(main())
