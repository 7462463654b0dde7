"""Host-side DTW tile preparation: swap/pad/bucket + device dispatch.

The sparse border constraint turns chains into many small (a, b) DTW
problems ("tiles", rmap.cpp:248-293). Tiles are swapped so a is the
longer sequence (dtw.cpp:283-292), padded to static bucket shapes, and
dispatched to the batched device kernel; each (max_n, dpw) bucket shape
compiles once and is reused.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from rawalign_tpu.map import dtw as ddtw


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass
class TileBatch:
    a: np.ndarray
    a_len: np.ndarray
    b: np.ndarray
    b_len: np.ndarray
    radius: np.ndarray
    exclude_last: np.ndarray


def prepare_tiles(
    pairs: list[tuple[np.ndarray, np.ndarray, int, bool]],
) -> TileBatch:
    """pairs: (read_region, ref_region, band_radius, exclude_last).

    Swaps each pair so a is the longer sequence; the band radius is
    computed by the caller from the READ region length before swapping
    (rmap.cpp:276).
    """
    T = len(pairs)
    a_list, b_list = [], []
    for read_r, ref_r, _, _ in pairs:
        if read_r.size >= ref_r.size:
            a_list.append(read_r)
            b_list.append(ref_r)
        else:
            a_list.append(ref_r)
            b_list.append(read_r)
    la = max((x.size for x in a_list), default=1)
    lb = max((x.size for x in b_list), default=1)
    a = np.zeros((T, la), dtype=np.float32)
    b = np.zeros((T, lb), dtype=np.float32)
    a_len = np.zeros(T, dtype=np.int32)
    b_len = np.zeros(T, dtype=np.int32)
    radius = np.zeros(T, dtype=np.int32)
    excl = np.zeros(T, dtype=bool)
    for i, (pa, pb) in enumerate(zip(a_list, b_list)):
        a[i, : pa.size] = pa
        b[i, : pb.size] = pb
        a_len[i] = pa.size
        b_len[i] = pb.size
        radius[i] = pairs[i][2]
        excl[i] = pairs[i][3]
    return TileBatch(a, a_len, b, b_len, radius, excl)


def max_widened_radius(batch: TileBatch) -> int:
    n = batch.a_len.astype(np.int64)
    m = batch.b_len.astype(np.int64)
    r = batch.radius.astype(np.int64)
    widened = r + ((n - m) * r + n - 1) // np.maximum(n, 1)
    return int(widened.max(initial=1))


def dtw_banded(batch: TileBatch) -> np.ndarray:
    """Run the batched banded DTW kernel; returns (T,) float32 costs."""
    if batch.a.shape[0] == 0:
        return np.zeros(0, dtype=np.float32)
    dpw = _round_up(max_widened_radius(batch) + 2, 8)
    max_n = _round_up(int(batch.a_len.max(initial=1)), 16)
    out = ddtw.dtw_banded_batch(
        batch.a,
        batch.a_len,
        batch.b,
        batch.b_len,
        batch.radius,
        batch.exclude_last,
        dpw=dpw,
        max_n=max_n,
    )
    return np.asarray(out)
