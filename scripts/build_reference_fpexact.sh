#!/bin/bash
# Build the reference binary with -ffp-contract=off (on top of the
# stock -O3 -march=native flags) into /tmp/ref_fpexact.
#
# Why this variant exists (round-4 byte-parity root cause): the stock
# -march=native build lets gcc contract a*b+c into FMAs inside the
# event detector's t-stat floats (revent.c:34-75), which flips event
# boundaries on ~8% of reads versus the same source compiled without
# contraction. The reference's behavior is therefore compiler-flag
# dependent; our golden model and engine reproduce the PORTABLE
# (contract-off) semantics bit-exactly — tools/ref_parity.py compares
# against both builds and docs/byte_parity_r4.md records the split.
set -euo pipefail

REPO=${REPO:-$(cd "$(dirname "$0")/.." && pwd)}
export BUILD_DIR=${FPEXACT_BUILD_DIR:-/tmp/ref_fpexact}

if [ -x "$BUILD_DIR/src/rawalign" ] && [ -z "${FORCE:-}" ]; then
    echo "already built: $BUILD_DIR/src/rawalign" >&2
    exit 0
fi

FORCE=1 bash "$REPO/scripts/build_reference.sh" || true
cd "$BUILD_DIR/src"
sed -i "s/-march=native/-march=native -ffp-contract=off/" Makefile.baseline
make -f Makefile.baseline clean >/dev/null
make -f Makefile.baseline -j"$(nproc)" >/dev/null
echo "built (ffp-contract=off): $BUILD_DIR/src/rawalign" >&2
