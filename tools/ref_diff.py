#!/usr/bin/env python
"""Field-by-field root-cause diff of PAF divergence vs the reference binary.

Maps the standard synthetic dataset three ways:

  A. reference binary (/tmp/ref_baseline, -t 1)
  B. golden NumPy engine (C-double semantics, rawalign_tpu.golden.engine)
  C. device engine (MappingEngine)

and classifies every read:

  - ``identical``           A == B == C byte-for-byte (mt:f stripped)
  - ``device_float``        A == B but C differs  -> device event-detector
                            float drift (revent.c:22-75 doubles vs f32)
  - ``golden_semantic``     A != B                -> semantic/format drift in
                            our reimplementation (the deterministic class
                            VERDICT r3 asks to root-cause)

For the golden_semantic class, prints which PAF columns/tags differ and a
histogram over fields, so the residual causes can be enumerated.

Usage: python tools/ref_diff.py [--kb 200] [--reads 256] [--show 10]
"""

import argparse
import collections
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ref_parity import (  # noqa: E402
    BIN,
    binary_map,
    engine_map,
    make_data,
    strip_mt,
)

COLS = [
    "name", "rlen", "rstart", "rend", "strand", "ref", "reflen",
    "tstart", "tend", "match", "tlen", "mapq",
]


def parse_paf(text):
    out = {}
    for ln in strip_mt(text).splitlines():
        cols = ln.split("\t")
        if len(cols) >= 12:
            out[cols[0]] = cols
    return out


def tag_dict(cols):
    d = {}
    for t in cols[12:]:
        parts = t.split(":", 2)
        if len(parts) == 3:
            d[parts[0]] = parts[2]
    return d


def diff_fields(ca, cb):
    """Return list of (field, a_val, b_val) differences."""
    diffs = []
    for i in range(min(len(ca), len(cb), 12)):
        if ca[i] != cb[i]:
            diffs.append((COLS[i], ca[i], cb[i]))
    ta, tb = tag_dict(ca), tag_dict(cb)
    for k in sorted(set(ta) | set(tb)):
        if ta.get(k) != tb.get(k):
            diffs.append((f"tag:{k}", ta.get(k, "<absent>"), tb.get(k, "<absent>")))
    return diffs


def golden_paf(idx, ds, mo):
    from rawalign_tpu.golden import engine as geng
    from rawalign_tpu.io import paf

    from tools.ref_baseline import digitize

    reads = [(r.name, digitize(r.signal)) for r in ds.reads]
    lines = [paf.paf_line(r) for r in geng.map_reads(idx, iter(reads), mo)]
    return "\n".join(lines) + "\n"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kb", type=int, default=200)
    ap.add_argument("--reads", type=int, default=256)
    ap.add_argument("--show", type=int, default=10)
    ap.add_argument("--skip-device", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if not os.path.exists(BIN):
        print("reference binary missing; run scripts/build_reference.sh",
              file=sys.stderr)
        return 1

    from rawalign_tpu import config
    from rawalign_tpu.config import MappingFlag
    from rawalign_tpu.index import index as dindex

    data, ds, ref_fa, model_txt, sraw, ind = make_data(args.kb, args.reads)
    A = parse_paf(binary_map(ind, sraw))

    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)

    B = parse_paf(golden_paf(idx, ds, mo))
    C = {}
    if not args.skip_device:
        dev_text, _ = engine_map(idx, ds, batch_size=64)
        C = parse_paf(dev_text)

    classes = collections.Counter()
    field_hist = collections.Counter()
    shown = 0
    samples = []
    for name in sorted(A):
        ca, cb = A[name], B.get(name)
        if cb is None:
            classes["missing_in_golden"] += 1
            continue
        ga = "\t".join(ca) == "\t".join(cb)
        if ga:
            cc = C.get(name)
            if C and cc is not None and "\t".join(cc) != "\t".join(ca):
                classes["device_float"] += 1
            else:
                classes["identical"] += 1
            continue
        classes["golden_semantic"] += 1
        diffs = diff_fields(ca, cb)
        for f, _, _ in diffs:
            field_hist[f] += 1
        if shown < args.show:
            shown += 1
            samples.append({"read": name,
                            "diffs": [list(d) for d in diffs]})

    report = {
        "kb": args.kb,
        "n": len(A),
        "classes": dict(classes),
        "golden_field_histogram": dict(field_hist),
        "samples": samples,
    }
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
