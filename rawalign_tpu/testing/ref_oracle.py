"""Build and wrap the reference event-detector and sketcher as oracles.

Compiles /root/reference/src/{revent.c, rsketch.c, kalloc.c} (read-only
reference checkout; not part of this repo) into a shared library at test
time and exposes ``detect_events`` (revent.c:190-210) and ``ri_sketch``
(rsketch.c:276-284) via ctypes — the same pattern as dtw_oracle.py. Used
only by the test suite to validate the golden model and the device
kernels against the actual reference semantics (VERDICT round-1 item 3:
events/sketch parity rested on a hand-derived golden model). If the
reference checkout or a C compiler is unavailable, oracle tests skip.
"""

from __future__ import annotations

import ctypes
import functools
import os
import subprocess
import tempfile

import numpy as np

REFERENCE_SRC = "/root/reference/src"

_WRAPPER = r"""
#include <stdlib.h>
#include <string.h>
#include "revent.h"
#include "rsketch.h"
#include "rutils.h"

/* detect_events (revent.c:190-210): km=NULL falls back to malloc
   (kalloc.c:134,161,175), so no pool setup is needed. */
int c_detect_events(uint32_t s_len, const float* sig, uint32_t w1,
                    uint32_t w2, float t1, float t2, float ph, float* out,
                    uint32_t cap) {
  ri_mapopt_t opt;
  memset(&opt, 0, sizeof(opt));
  opt.window_length1 = w1;
  opt.window_length2 = w2;
  opt.threshold1 = t1;
  opt.threshold2 = t2;
  opt.peak_height = ph;
  uint32_t n = 0;
  float* ev = detect_events(NULL, s_len, sig, &opt, &n);
  if (!ev) return 0;
  if (n > cap) {
    free(ev);
    return -(int)n;
  }
  memcpy(out, ev, n * sizeof(float));
  free(ev);
  return (int)n;
}

/* ri_sketch (rsketch.c:276-284): both the w=0 per-event mode
   (ri_sketch_reg) and the w>0 minimizer mode (ri_sketch_min). */
int c_ri_sketch(const float* vals, uint32_t id, int strand, int len, int w,
                int e, int n, int q, int lq, int k, uint64_t* out_x,
                uint64_t* out_y, uint32_t cap) {
  mm128_v p;
  p.n = 0;
  p.m = 0;
  p.a = 0;
  ri_sketch(NULL, vals, id, strand, len, w, e, n, q, lq, k, &p);
  if (p.n > cap) {
    free(p.a);
    return -(int)p.n;
  }
  for (size_t i = 0; i < p.n; i++) {
    out_x[i] = p.a[i].x;
    out_y[i] = p.a[i].y;
  }
  free(p.a);
  return (int)p.n;
}
"""


@functools.lru_cache(maxsize=1)
def load_oracle():
    """Compile (once per environment) and load the oracle library.

    Returns the ctypes CDLL or None if unavailable.
    """
    srcs = [
        os.path.join(REFERENCE_SRC, f)
        for f in ("revent.c", "rsketch.c", "kalloc.c")
    ]
    if not all(os.path.exists(s) for s in srcs):
        return None
    cache_dir = os.path.join(tempfile.gettempdir(), "rawalign_tpu_oracle")
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "ref_oracle.so")
    if not os.path.exists(so_path):
        wrapper = os.path.join(cache_dir, "ref_wrapper.c")
        with open(wrapper, "w") as f:
            f.write(_WRAPPER)
        cmd = [
            "gcc",
            "-O2",
            "-fPIC",
            "-shared",
            f"-I{REFERENCE_SRC}",
            wrapper,
            *srcs,
            "-o",
            so_path,
            "-lm",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError):
            return None
    lib = ctypes.CDLL(so_path)
    u32 = ctypes.c_uint32
    i32 = ctypes.c_int
    fl = ctypes.c_float
    pf = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    pu64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    lib.c_detect_events.restype = i32
    lib.c_detect_events.argtypes = [u32, pf, u32, u32, fl, fl, fl, pf, u32]
    lib.c_ri_sketch.restype = i32
    lib.c_ri_sketch.argtypes = [
        pf,
        u32,
        i32,
        i32,
        i32,
        i32,
        i32,
        i32,
        i32,
        i32,
        pu64,
        pu64,
        u32,
    ]
    return lib


def detect_events(
    sig,
    *,
    window_length1: int = 3,
    window_length2: int = 6,
    threshold1: float = 4.30265,
    threshold2: float = 2.57058,
    peak_height: float = 1.0,
) -> np.ndarray:
    """Reference detect_events on one signal chunk; returns the
    z-normalized event means (revent.c:140-210)."""
    lib = load_oracle()
    sig = np.ascontiguousarray(sig, dtype=np.float32)
    cap = sig.size + 1
    out = np.zeros(cap, dtype=np.float32)
    n = lib.c_detect_events(
        sig.size,
        sig,
        window_length1,
        window_length2,
        threshold1,
        threshold2,
        peak_height,
        out,
        cap,
    )
    assert n >= 0, "oracle event buffer too small"
    return out[:n].copy()


def ri_sketch(
    values,
    *,
    id: int = 0,
    strand: int = 0,
    w: int = 0,
    e: int = 6,
    n: int = 0,
    q: int = 9,
    lq: int = 3,
    k: int = 6,
) -> tuple[np.ndarray, np.ndarray]:
    """Reference ri_sketch on one normalized event array; returns
    (x, y) seed arrays (mm128_t fields, rsketch.h:39-43)."""
    lib = load_oracle()
    values = np.ascontiguousarray(values, dtype=np.float32)
    cap = max(16, 2 * values.size + 16)
    out_x = np.zeros(cap, dtype=np.uint64)
    out_y = np.zeros(cap, dtype=np.uint64)
    got = lib.c_ri_sketch(
        values,
        id,
        strand,
        values.size,
        w,
        e,
        n,
        q,
        lq,
        k,
        out_x,
        out_y,
        cap,
    )
    assert got >= 0, "oracle seed buffer too small"
    return out_x[:got].copy(), out_y[:got].copy()
