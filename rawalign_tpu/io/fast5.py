"""FAST5 signal ingest (host side).

Replaces the reference's hdf5_tools C++ wrapper (src/rsig.cpp:43-230,
src/hdf5_tools.hpp) with h5py. Handles both single- and multi-read FAST5
layouts, reads the channel calibration (digitisation, range, offset),
converts raw DAC values to picoamperes ``(raw + offset) * range / dig``
and keeps only values in the open interval (30, 200) pA, exactly like the
reference (rsig.cpp:216-224). Also provides the recursive .fast5
directory discovery (find_fast5, rsig.cpp:152-184).

A simple .npz-based container ("sigbin") is provided as a portable
alternative for synthetic datasets and tests.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

try:
    import h5py

    HAVE_H5PY = True
except Exception:  # pragma: no cover
    HAVE_H5PY = False


def find_signal_files(
    path: str, exts=(".fast5", ".sigbin.npz", ".slow5")
) -> list[str]:
    """Recursive discovery of signal files (find_fast5, rsig.cpp:152-184)."""
    out: list[str] = []
    if not os.path.isdir(path):
        if any(path.endswith(e) for e in exts):
            out.append(path)
        return out
    for root, _dirs, files in os.walk(path):
        for f in sorted(files):
            if any(f.endswith(e) for e in exts):
                out.append(os.path.join(root, f))
    return sorted(out)


_VBZ_FILTER_ID = 32020  # ONT vbz_compression HDF5 filter


def _read_signal_dataset(dset) -> np.ndarray:
    """Read a Signal dataset, diagnosing a missing VBZ plugin.

    ONT FAST5s are commonly vbz-compressed (HDF5 filter 32020); without
    the plugin h5py fails with an opaque 'required filter is not
    registered' OSError. The reference ships
    ensure_hdf5_vbz_plugin.sh + HDF5_PLUGIN_PATH for this; we detect the
    filter and point at the same remedy."""
    try:
        return np.asarray(dset[:])
    except OSError as e:
        # check the dataset creation property list for the vbz filter
        compressed = False
        try:
            plist = dset.id.get_create_plist()
            compressed = any(
                plist.get_filter(i)[0] == _VBZ_FILTER_ID
                for i in range(plist.get_nfilters())
            )
        except Exception:
            pass
        if compressed or "filter" in str(e).lower():
            raise RuntimeError(
                f"{dset.file.filename}: signal is VBZ-compressed (HDF5 "
                f"filter {_VBZ_FILTER_ID}) and the vbz plugin is not "
                "loaded. Install ont-vbz-hdf5-plugin and set "
                "HDF5_PLUGIN_PATH to its directory (see the reference's "
                "ensure_hdf5_vbz_plugin.sh), or convert the file with "
                "'slow5tools f2s | slow5tools view' to ASCII .slow5."
            ) from e
        raise


def _convert(raw: np.ndarray, dig: float, rng: float, off: float) -> np.ndarray:
    scale = rng / dig
    sig = (raw.astype(np.float32) + np.float32(off)) * np.float32(scale)
    keep = (sig > 30) & (sig < 200)
    return sig[keep]


def read_fast5(path: str) -> Iterator[tuple[str, np.ndarray]]:
    """Yield (read_id, pA_signal) for every read in a FAST5 file."""
    if not HAVE_H5PY:  # pragma: no cover
        raise RuntimeError("h5py unavailable; cannot read FAST5")
    with h5py.File(path, "r") as f:
        if "Raw" in f:  # single-read layout (rsig.cpp:73-83)
            ch = f["/UniqueGlobalKey/channel_id"].attrs
            dig = float(ch["digitisation"])
            rng = float(ch["range"])
            off = float(ch["offset"])
            for read_name in f["/Raw/Reads"]:
                grp = f["/Raw/Reads"][read_name]
                rid = grp.attrs["read_id"]
                rid = rid.decode() if isinstance(rid, bytes) else str(rid)
                raw = _read_signal_dataset(grp["Signal"])
                yield rid, _convert(raw, dig, rng, off)
        else:  # multi-read layout (rsig.cpp:84-91)
            for read_name in f:
                grp = f[read_name]
                raw_grp = grp["Raw"]
                ch = grp["channel_id"].attrs
                dig = float(ch["digitisation"])
                rng = float(ch["range"])
                off = float(ch["offset"])
                rid = raw_grp.attrs["read_id"]
                rid = rid.decode() if isinstance(rid, bytes) else str(rid)
                raw = _read_signal_dataset(raw_grp["Signal"])
                yield rid, _convert(raw, dig, rng, off)


def write_fast5(
    path: str, reads: list[tuple[str, np.ndarray]],
    *, dig: float = 8192.0, rng: float = 1400.0, off: float = 10.0,
) -> None:
    """Write a multi-read FAST5 with pA signals quantized to raw DAC."""
    if not HAVE_H5PY:  # pragma: no cover
        raise RuntimeError("h5py unavailable; cannot write FAST5")
    scale = rng / dig
    with h5py.File(path, "w") as f:
        for i, (rid, sig) in enumerate(reads):
            grp = f.create_group(f"read_{rid}")
            raw_grp = grp.create_group("Raw")
            raw = np.round(np.asarray(sig, np.float64) / scale - off).astype(
                np.int16
            )
            raw_grp.create_dataset("Signal", data=raw)
            raw_grp.attrs["read_id"] = np.bytes_(rid)
            ch = grp.create_group("channel_id")
            ch.attrs["digitisation"] = np.float64(dig)
            ch.attrs["range"] = np.float64(rng)
            ch.attrs["offset"] = np.float64(off)
            ch.attrs["channel_number"] = np.bytes_(str(i + 1))


def write_sigbin(path: str, reads: list[tuple[str, np.ndarray]]) -> None:
    """Portable signal container: float32 pA signals keyed by read id."""
    np.savez_compressed(
        path,
        names=np.array([r[0] for r in reads]),
        **{f"sig_{i}": np.asarray(r[1], np.float32) for i, r in enumerate(reads)},
    )


def read_sigbin(path: str) -> Iterator[tuple[str, np.ndarray]]:
    z = np.load(path, allow_pickle=False)
    names = z["names"]
    for i, name in enumerate(names):
        sig = z[f"sig_{i}"].astype(np.float32)
        keep = (sig > 30) & (sig < 200)
        yield str(name), sig[keep]


def read_signals(paths: list[str]) -> Iterator[tuple[str, np.ndarray]]:
    """Stream reads from a mixed list of signal files."""
    for p in paths:
        if p.endswith(".fast5"):
            yield from read_fast5(p)
        elif p.endswith(".npz"):
            yield from read_sigbin(p)
        elif p.endswith(".slow5"):
            from rawalign_tpu.io.slow5 import read_slow5

            yield from read_slow5(p)
        else:
            raise ValueError(f"unknown signal file type: {p}")
