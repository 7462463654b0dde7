"""Adversarial FAST5 ingest (VERDICT r4 item 7): files NOT produced by
``fast5.write_fast5`` — layout and encoding variants the reference's
hdf5_tools/plugin stack tolerates (rsig.cpp:43-96,186-230):

- full-edge-chunk padding: HDF5 applies filters to FULL chunks, padding
  the last one with fill values, so a plugin-written trailing blob
  declares size == 2*chunk_len > 2*n_remaining
- raw chunks with the OPTIONAL vbz filter skipped (filter_mask bit set)
- single-read legacy layout (/Raw/Reads + /UniqueGlobalKey/channel_id)
- attribute typing variants (string / float32 / 1-element array attrs —
  the reference stringifies+atof()s everything)
"""

import numpy as np
import pytest

from rawalign_tpu.io import fast5, vbz

pytestmark = pytest.mark.skipif(
    not (fast5.HAVE_H5PY and vbz.HAVE_ZSTD),
    reason="h5py/zstandard unavailable",
)


def _dac(n, seed=0, base=550.0):
    rng = np.random.default_rng(seed)
    return (base + np.cumsum(rng.normal(0, 4, n))).astype(np.int16)


def test_vbz_decompress_padded_size_header():
    """A trailing blob filtered at FULL chunk size decodes when only a
    prefix is expected (ADVICE r4 medium)."""
    chunk = 4096
    full = _dac(chunk, seed=3)
    blob = vbz.compress(full)  # size header says 2*chunk
    for m in (1, 7, 1000, chunk - 1, chunk):
        vals = vbz.decompress(blob, n_expected=m)
        assert vals.size >= m
        assert np.array_equal(vals[:m], full[:m])


def _write_plugin_style_vbz(raw_grp, raw, chunk):
    """Write a Signal dataset the way the real filter pipeline does:
    EVERY stored chunk (including the last) is filtered at full chunk
    length, the tail padded with zeros."""
    import h5py

    n = int(raw.size)
    space = h5py.h5s.create_simple((n,))
    dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
    dcpl.set_chunk((chunk,))
    dcpl.set_filter(fast5._VBZ_FILTER_ID, h5py.h5z.FLAG_OPTIONAL, (0, 2, 1, 1))
    did = h5py.h5d.create(
        raw_grp.id, b"Signal", h5py.h5t.STD_I16LE, space, dcpl
    )
    for start in range(0, n, chunk):
        part = raw[start : start + chunk]
        if part.size < chunk:  # full-chunk padding, like H5Z does
            part = np.concatenate(
                [part, np.zeros(chunk - part.size, np.int16)]
            )
        did.write_direct_chunk((start,), vbz.compress(part), filter_mask=0)
    did.close()


def _multi_read_group(f, rid, *, dig=8192.0, rng=1400.0, off=10.0):
    grp = f.create_group(f"read_{rid}")
    raw_grp = grp.create_group("Raw")
    raw_grp.attrs["read_id"] = np.bytes_(rid)
    ch = grp.create_group("channel_id")
    ch.attrs["digitisation"] = np.float64(dig)
    ch.attrs["range"] = np.float64(rng)
    ch.attrs["offset"] = np.float64(off)
    return grp, raw_grp


def _expect_pa(raw, dig=8192.0, rng=1400.0, off=10.0):
    return fast5._convert(raw.astype(np.int16), dig, rng, off)


def test_padded_edge_chunk_fast5(tmp_path):
    """Signal length NOT a multiple of the chunk size, last chunk
    filtered at full length (the real-plugin layout write_fast5 never
    produces)."""
    import h5py

    n, chunk = 10_000, 4096  # last chunk holds 1808 of 4096 values
    raw = _dac(n, seed=5)
    p = str(tmp_path / "padded.fast5")
    with h5py.File(p, "w") as f:
        _, raw_grp = _multi_read_group(f, "padded0")
        _write_plugin_style_vbz(raw_grp, raw, chunk)
    out = dict(fast5.read_fast5(p))
    assert set(out) == {"padded0"}
    np.testing.assert_array_equal(out["padded0"], _expect_pa(raw))


def test_skipped_optional_filter_chunk(tmp_path):
    """A chunk whose OPTIONAL vbz filter was skipped at write time
    stores raw little-endian int16; the filter_mask bit marks it."""
    import h5py

    n = chunk = 2048
    raw = _dac(n, seed=6)
    p = str(tmp_path / "skipped.fast5")
    with h5py.File(p, "w") as f:
        _, raw_grp = _multi_read_group(f, "skip0")
        space = h5py.h5s.create_simple((n,))
        dcpl = h5py.h5p.create(h5py.h5p.DATASET_CREATE)
        dcpl.set_chunk((chunk,))
        dcpl.set_filter(
            fast5._VBZ_FILTER_ID, h5py.h5z.FLAG_OPTIONAL, (0, 2, 1, 1)
        )
        did = h5py.h5d.create(
            raw_grp.id, b"Signal", h5py.h5t.STD_I16LE, space, dcpl
        )
        # filter_mask bit 0 set => pipeline filter 0 (vbz) was skipped
        did.write_direct_chunk((0,), raw.tobytes(), filter_mask=0x1)
        did.close()
    out = dict(fast5.read_fast5(p))
    np.testing.assert_array_equal(out["skip0"], _expect_pa(raw))


def test_single_read_legacy_layout(tmp_path):
    """/Raw/Reads/Read_N + /UniqueGlobalKey/channel_id, the pre-2019
    one-read-per-file layout (rsig.cpp:73-83)."""
    import h5py

    raw = _dac(6000, seed=7)
    p = str(tmp_path / "legacy.fast5")
    with h5py.File(p, "w") as f:
        ugk = f.create_group("UniqueGlobalKey")
        ch = ugk.create_group("channel_id")
        ch.attrs["digitisation"] = np.float64(8192.0)
        ch.attrs["range"] = np.float64(1400.0)
        ch.attrs["offset"] = np.float64(10.0)
        reads = f.create_group("Raw").create_group("Reads")
        g = reads.create_group("Read_42")
        g.attrs["read_id"] = np.bytes_("legacy-read-42")
        g.create_dataset("Signal", data=raw)
    out = dict(fast5.read_fast5(p))
    assert set(out) == {"legacy-read-42"}
    np.testing.assert_array_equal(out["legacy-read-42"], _expect_pa(raw))


def test_attribute_typing_variants(tmp_path):
    """String digitisation, float32 range, 1-element-array offset,
    str (non-bytes) read_id — all accepted by the reference's
    stringify+atof attribute walk."""
    import h5py

    raw = _dac(3000, seed=8)
    p = str(tmp_path / "attrs.fast5")
    with h5py.File(p, "w") as f:
        grp = f.create_group("read_attr0")
        raw_grp = grp.create_group("Raw")
        raw_grp.attrs["read_id"] = "attr0"  # str, not bytes
        raw_grp.create_dataset("Signal", data=raw)
        ch = grp.create_group("channel_id")
        ch.attrs["digitisation"] = np.bytes_("8192.0")  # string
        ch.attrs["range"] = np.float32(1400.0)  # float32
        ch.attrs["offset"] = np.array([10.0])  # 1-element array
    out = dict(fast5.read_fast5(p))
    assert set(out) == {"attr0"}
    np.testing.assert_array_equal(out["attr0"], _expect_pa(raw))


def test_gzip_compressed_multi_read(tmp_path):
    """Pre-vbz ONT files gzip the Signal dataset (an HDF5 builtin —
    exercises the non-direct-chunk read path on a filtered dataset)."""
    import h5py

    raw = _dac(5000, seed=9)
    p = str(tmp_path / "gz.fast5")
    with h5py.File(p, "w") as f:
        _, raw_grp = _multi_read_group(f, "gz0")
        raw_grp.create_dataset(
            "Signal", data=raw, compression="gzip", chunks=(1024,)
        )
    out = dict(fast5.read_fast5(p))
    np.testing.assert_array_equal(out["gz0"], _expect_pa(raw))
