#!/bin/bash
# Build the reference RawAlign binary (for baseline benchmarking only).
#
# The reference vendors HDF5 as a git submodule that is empty in this
# environment and no HDF5 dev headers exist, so src/rsig.cpp's three
# HDF5-touching functions (ri_sig_open / ri_sig_close / ri_read_sig,
# rsig.cpp:43-111,186-230) are replaced in a SCRATCH COPY by
# tools/refshim/rsig_shim.cpp, which reads a plain-binary signal
# container ("SRAWBIN1", written by tools/ref_baseline.py) and performs
# the identical pA conversion + clip. All compute code (revent.c,
# rsketch.c, rawindex.cpp, rmap.cpp, dtw.cpp, kthread.c) compiles
# byte-for-byte unmodified. Nothing from the reference is copied into
# this repository; the build tree lives under BUILD_DIR (default
# /tmp/ref_baseline).
set -euo pipefail

REF=${REF:-/root/reference}
REPO=${REPO:-$(cd "$(dirname "$0")/.." && pwd)}
BUILD_DIR=${BUILD_DIR:-/tmp/ref_baseline}

if [ -x "$BUILD_DIR/src/rawalign" ] && [ -z "${FORCE:-}" ]; then
    echo "already built: $BUILD_DIR/src/rawalign" >&2
    exit 0
fi

rm -rf "$BUILD_DIR"
mkdir -p "$BUILD_DIR"
cp -r "$REF/src" "$BUILD_DIR/src"
chmod -R u+w "$BUILD_DIR/src"
cd "$BUILD_DIR/src"

# 1) rsig.h: drop the HDF5 wrapper include; the struct keeps an opaque
#    pointer field (the shim stores its own handle there).
# (the extra std includes were transitively provided by hdf5_tools.hpp)
sed -i 's|#include "hdf5_tools.hpp"|#include <cstring>\n#include <cstdio>\n#include <cstdlib>\n#include <cerrno>\n#include <cassert>\n#include <tuple>\n#include <iostream>\n#include <string>\n#include <vector>\n#include <algorithm>\nnamespace hdf5_tools { class File; }|' rsig.h

# 2) rsig.cpp: delete exactly the three HDF5-dependent functions
#    (verified line ranges of the pristine file: 43-111 ri_sig_open +
#    ri_sig_close, 186-230 ri_read_sig).
python3 - <<'EOF'
lines = open('rsig.cpp').read().splitlines(keepends=True)
assert 'ri_sig_open' in lines[42], lines[42]
assert 'ri_read_sig' in lines[185], lines[185]
decl = 'extern "C" ri_sig_file_t *ri_sig_open(const char *fn);\n'
keep = lines[:42] + [decl] + lines[111:185]
open('rsig.cpp', 'w').writelines(keep)
EOF

cp "$REPO/tools/refshim/rsig_shim.cpp" rsig_shim.cpp
cp "$REPO/tools/refshim/Makefile.baseline" Makefile.baseline

make -f Makefile.baseline -j"$(nproc)" 2> "$BUILD_DIR/build.log" || {
    echo "BUILD FAILED — tail of $BUILD_DIR/build.log:" >&2
    tail -40 "$BUILD_DIR/build.log" >&2
    exit 1
}
echo "built: $BUILD_DIR/src/rawalign" >&2
"$BUILD_DIR/src/rawalign" --version >&2 || true
