#!/usr/bin/env python
"""PAF parity + index interop vs the REAL reference binary, per scale.

Three bars per genome scale (the reference binary is built by
scripts/build_reference.sh; datasets are the same synthetic ones
REF_BASELINE.json measures):

1. **Index interop, reference -> us**: the reference binary builds
   ``ref.ind`` (rawindex.cpp:275-315); ``load_reference_index`` loads
   it; our engine maps the read set with it. Compared against our
   engine running on our own ``build_index`` tables — the PAF must be
   byte-identical (mt:f timing tag excluded): the loaded tables ARE the
   index, so any divergence is a format-reader bug.

2. **Index interop, us -> reference**: ``build_index`` +
   ``dump_reference_index`` writes an ``.ind`` the reference binary
   then maps with (rawindex.cpp:317-377 load path). Its PAF must be
   byte-identical (mt excluded) to the binary mapping with its OWN
   index: identical lookup answers => identical mapping.

3. **Engine-vs-binary mapping parity**: our engine's PAF vs the
   binary's on the same reads + same index. The event detector
   accumulates in float32 on device vs C doubles (revent.c:22-75), so
   a small fraction of reads sees ulp-flipped event boundaries ->
   shifted anchors; the bar is therefore statistical: every read agrees
   on mapped/unmapped, and mapped reads agree on (target, strand) with
   positions within a tolerance; the byte-identical fraction is
   reported for tracking.

``--flood`` additionally runs our engine with a tiny anchor budget so
over-budget decimation (engine anchors_dropped > 0) is exercised
against the uncapped reference (rmap.cpp:371-391 appends all hits).

Usage:
  python tools/ref_parity.py --scales 200:256,1000:256,5000:256 \
      --flood --out docs/ref_parity_r3.json
"""

import argparse
import json
import os
import re
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.ref_baseline import (  # noqa: E402
    BIN,
    BUILD_DIR,
    digitize,
    write_sraw,
)

_MT = re.compile(r"\tmt:f:[^\t\n]*")


def strip_mt(text: str) -> str:
    return _MT.sub("", text)


def make_data(genome_kb: int, n_reads: int):
    from rawalign_tpu.io import fasta
    from rawalign_tpu.pore_model import save_pore_model
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
    sraw = os.path.join(data, f"reads_{n_reads}.fast5")
    if not os.path.exists(ref_fa):
        fasta.write_fasta(ref_fa, [(s.name, s.seq) for s in ds.seqs])
        save_pore_model(model_txt, ds.model)
    if not os.path.exists(sraw):
        write_sraw(sraw, [(r.name, r.signal) for r in ds.reads])
    ind = os.path.join(data, "ref.ind")
    if not os.path.exists(ind):
        subprocess.run(
            [BIN, "-x", "sensitive", "-t", str(os.cpu_count() or 1),
             "-d", ind, "-p", model_txt, ref_fa],
            check=True, capture_output=True,
        )
    return data, ds, ref_fa, model_txt, sraw, ind


FPEXACT_BIN = os.path.join(
    os.environ.get("FPEXACT_BUILD_DIR", "/tmp/ref_fpexact"), "src", "rawalign"
)


def binary_map(
    ind: str, sraw: str, bin_path: str = BIN, cigar: bool = False
) -> str:
    cmd = [bin_path, "-x", "sensitive", "--dtw-evaluate-chains"]
    if cigar:
        cmd.append("--dtw-output-cigar")
    p = subprocess.run(
        cmd + ["-t", "1", ind, sraw],
        check=True, capture_output=True, text=True,
    )
    return p.stdout


def engine_map(idx, ds, cigar: bool = False, **engine_kw) -> tuple[str, dict]:
    from rawalign_tpu import config
    from rawalign_tpu.config import MappingFlag
    from rawalign_tpu.io import paf
    from rawalign_tpu.map.engine import MappingEngine

    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    if cigar:
        mo.set_flag(MappingFlag.DTW_OUTPUT_CIGAR)
    eng = MappingEngine(idx, mo, **engine_kw)
    # digitize(): the binary reads int16 DAC round-tripped signals; feed
    # the engine byte-identical inputs or parity is meaningless.
    reads = [(r.name, digitize(r.signal)) for r in ds.reads]
    lines = [paf.paf_line(r) for r in eng.map_reads(iter(reads))]
    return "\n".join(lines) + "\n", dict(eng.counters)


def compare_pafs(a_text: str, b_text: str, tol_bp: int = 50) -> dict:
    """a = baseline (binary), b = candidate. Keyed by read name."""

    def parse(text):
        out = {}
        for ln in strip_mt(text).splitlines():
            cols = ln.split("\t")
            if len(cols) >= 12:
                out[cols[0]] = (ln, cols)
        return out

    A, B = parse(a_text), parse(b_text)
    names = sorted(set(A) | set(B))
    n = len(names)
    stats = {
        "reads": n,
        "missing": sum(1 for x in names if x not in A or x not in B),
        "mapped_agree": 0,
        "byte_identical": 0,
        "target_strand_agree": 0,
        "pos_within_tol": 0,
        "both_mapped": 0,
        "max_pos_delta": 0,
    }
    for name in names:
        if name not in A or name not in B:
            continue
        la, ca = A[name]
        lb, cb = B[name]
        am, bm = ca[5] != "*", cb[5] != "*"
        if am == bm:
            stats["mapped_agree"] += 1
        if la == lb:
            stats["byte_identical"] += 1
        if am and bm:
            stats["both_mapped"] += 1
            if ca[5] == cb[5] and ca[4] == cb[4]:
                stats["target_strand_agree"] += 1
                d = max(
                    abs(int(ca[7]) - int(cb[7])), abs(int(ca[8]) - int(cb[8]))
                )
                stats["max_pos_delta"] = max(stats["max_pos_delta"], d)
                if d <= tol_bp:
                    stats["pos_within_tol"] += 1
    return stats


def run_scale(genome_kb: int, n_reads: int, flood: bool) -> dict:
    from rawalign_tpu import config
    from rawalign_tpu.index import index as dindex
    from rawalign_tpu.index.ref_format import (
        dump_reference_index,
        load_reference_index,
    )

    data, ds, ref_fa, model_txt, sraw, ind = make_data(genome_kb, n_reads)
    out = {"genome_kb": genome_kb, "n_reads": n_reads}

    ref_paf = binary_map(ind, sraw)

    # our index + our engine (the baseline for interop bar 1)
    io = config.IndexOptions()
    mo = config.MappingOptions()
    config.set_opt("sensitive", io, mo)
    idx_ours = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    # 50Mb-scale key multiplicity exceeds the default 128k anchor
    # ceiling (reads carry ~135k true anchors); byte parity with the
    # uncapped reference needs headroom
    kw = dict(batch_size=64)
    if genome_kb >= 20000:
        # 50Mb max key multiplicity exceeds the default per-seed cap
        # (max_occ=4096 dropped 30M hits there) and the true per-read
        # anchor demand exceeds the default 128k ceiling; parity with
        # the uncapped reference (rmap.cpp:371-391) needs both raised
        kw["max_anchors_ceiling"] = 1 << 20
        kw["max_occ"] = 1 << 15
    our_paf, counters = engine_map(idx_ours, ds, **kw)

    # bar 1: reference .ind loaded by us -> byte-identical to our index
    idx_loaded = load_reference_index(ind)
    loaded_paf, _ = engine_map(idx_loaded, ds, **kw)
    out["interop_ref_to_us_identical"] = strip_mt(loaded_paf) == strip_mt(
        our_paf
    )

    # bar 2: our index dumped to .ind -> the binary maps identically
    ours_ind = os.path.join(data, "ours.ind")
    dump_reference_index(idx_ours, ours_ind)
    ref_paf_oursind = binary_map(ours_ind, sraw)
    out["interop_us_to_ref_identical"] = strip_mt(
        ref_paf_oursind
    ) == strip_mt(ref_paf)

    # bar 3: engine-vs-binary statistical parity
    st = compare_pafs(ref_paf, our_paf)
    bm = max(st["both_mapped"], 1)
    out["engine_vs_binary"] = {
        **st,
        "mapped_agree_frac": round(st["mapped_agree"] / max(st["reads"], 1), 4),
        "target_strand_frac": round(st["target_strand_agree"] / bm, 4),
        "pos_within_tol_frac": round(st["pos_within_tol"] / bm, 4),
        "byte_identical_frac": round(
            st["byte_identical"] / max(st["reads"], 1), 4
        ),
    }
    out["engine_counters"] = {
        k: counters[k]
        for k in ("anchors_dropped", "seed_hits_dropped", "reads_mapped")
    }

    # bar 3b: against the -ffp-contract=off reference build (the
    # portable-FP semantics our golden/engine reproduce bit-exactly; the
    # stock -march=native binary FMA-contracts revent.c and diverges
    # from its own portable build — scripts/build_reference_fpexact.sh)
    if os.path.exists(FPEXACT_BIN):
        ind_fp = os.path.join(data, "ref_fpexact.ind")
        if not os.path.exists(ind_fp):
            subprocess.run(
                [FPEXACT_BIN, "-x", "sensitive", "-t",
                 str(os.cpu_count() or 1), "-d", ind_fp, "-p", model_txt,
                 ref_fa],
                check=True, capture_output=True,
            )
        ref_paf_fp = binary_map(ind_fp, sraw, FPEXACT_BIN)
        stfp = compare_pafs(ref_paf_fp, our_paf)
        bmfp = max(stfp["both_mapped"], 1)
        out["engine_vs_fpexact_binary"] = {
            **stfp,
            "mapped_agree_frac": round(
                stfp["mapped_agree"] / max(stfp["reads"], 1), 4
            ),
            "target_strand_frac": round(
                stfp["target_strand_agree"] / bmfp, 4
            ),
            "pos_within_tol_frac": round(stfp["pos_within_tol"] / bmfp, 4),
            "byte_identical_frac": round(
                stfp["byte_identical"] / max(stfp["reads"], 1), 4
            ),
        }

    # bar 3c: CIGAR path (--dtw-output-cigar) — the aln:s event-to-base
    # emission (rmap.cpp:715-717,741-744,782-790 + DTW_global_tb
    # rebasing rmap.cpp:218-235,282-291) byte-compared vs the fpexact
    # binary. VERDICT r4 item 2.
    if os.path.exists(FPEXACT_BIN):
        ind_fp = os.path.join(data, "ref_fpexact.ind")
        ref_paf_cig = binary_map(ind_fp, sraw, FPEXACT_BIN, cigar=True)
        our_paf_cig, _ = engine_map(idx_ours, ds, cigar=True, **kw)
        stc = compare_pafs(ref_paf_cig, our_paf_cig)
        bmc = max(stc["both_mapped"], 1)
        out["cigar_vs_fpexact_binary"] = {
            **stc,
            "mapped_agree_frac": round(
                stc["mapped_agree"] / max(stc["reads"], 1), 4
            ),
            "pos_within_tol_frac": round(stc["pos_within_tol"] / bmc, 4),
            "byte_identical_frac": round(
                stc["byte_identical"] / max(stc["reads"], 1), 4
            ),
        }

    if flood:
        # tiny anchor budget + big occ cap: every round floods the
        # budget, exercising decimation against the uncapped binary
        flood_paf, fc = engine_map(
            idx_ours, ds, batch_size=64, max_anchors=512,
            max_anchors_ceiling=512, max_occ=256,
        )
        stf = compare_pafs(ref_paf, flood_paf)
        bmf = max(stf["both_mapped"], 1)
        out["flood"] = {
            "anchors_dropped": fc["anchors_dropped"],
            "mapped_agree_frac": round(
                stf["mapped_agree"] / max(stf["reads"], 1), 4
            ),
            "target_strand_frac": round(stf["target_strand_agree"] / bmf, 4),
            "pos_within_tol_frac": round(stf["pos_within_tol"] / bmf, 4),
        }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="200:256")
    ap.add_argument("--flood", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if not os.path.exists(BIN):
        print(
            f"reference binary not found at {BIN}; run "
            "scripts/build_reference.sh first",
            file=sys.stderr,
        )
        return 1
    results = {}
    for spec in args.scales.split(","):
        kb, _, nr = spec.partition(":")
        r = run_scale(int(kb), int(nr) if nr else 256, args.flood)
        results[f"{kb}kb"] = r
        print(json.dumps(r))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
