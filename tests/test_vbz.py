"""VBZ codec + vbz-FAST5 ingest (VERDICT r3 item 8: exercise the FAST5
path on vbz-compressed multi-read files; no network, so the fixture is
generated with the same codec and ONT multi-read schema)."""

import numpy as np
import pytest

from rawalign_tpu import config
from rawalign_tpu.io import fast5, vbz
from rawalign_tpu.testing import synth

pytestmark = pytest.mark.skipif(
    not (fast5.HAVE_H5PY and vbz.HAVE_ZSTD),
    reason="h5py/zstandard unavailable",
)


@pytest.mark.parametrize("seed", range(5))
def test_svb16_roundtrip_random(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(0, 5000))
    v = rng.integers(-32768, 32767, n).astype(np.int16)
    payload = vbz.svb16_encode(v)
    back = vbz.svb16_decode(payload, n)
    assert np.array_equal(back, v)


def test_svb16_realistic_signal_compresses():
    """DAC signal deltas are small: most values should take 1 byte."""
    rng = np.random.default_rng(0)
    sig = (550 + np.cumsum(rng.normal(0, 4, 20000))).astype(np.int16)
    payload = vbz.svb16_encode(sig)
    # 1 control bit + ~1 data byte per value for small deltas
    assert len(payload) < 1.3 * sig.size


def test_vbz_compress_roundtrip():
    rng = np.random.default_rng(1)
    sig = (550 + np.cumsum(rng.normal(0, 4, 30000))).astype(np.int16)
    blob = vbz.compress(sig)
    assert len(blob) < sig.size * 2 // 2  # beats raw int16 by >2x
    back = vbz.decompress(blob)
    assert np.array_equal(back, sig)
    # with the expected-count cross-check
    back2 = vbz.decompress(blob, n_expected=sig.size)
    assert np.array_equal(back2, sig)


def test_vbz_unsized_fallback():
    """A blob missing the 4-byte size header still decodes when the
    chunk's element count is known."""
    rng = np.random.default_rng(2)
    sig = (550 + np.cumsum(rng.normal(0, 4, 1000))).astype(np.int16)
    blob = vbz.compress(sig)
    assert np.array_equal(
        vbz.decompress(blob[4:], n_expected=sig.size), sig
    )


def _dataset(tmp_path, compression, n_reads=4):
    ds = synth.make_dataset(
        seed=17, genome_lengths=[12_000], n_reads=n_reads,
        read_len_bp=(250, 500), noise_pa=1.3,
    )
    path = str(tmp_path / f"reads_{compression}.fast5")
    fast5.write_fast5(
        path, [(r.name, r.signal) for r in ds.reads],
        compression=compression,
    )
    return ds, path


@pytest.mark.parametrize("compression", ["none", "gzip", "vbz"])
def test_fast5_compressed_roundtrip(tmp_path, compression):
    """All three dataset encodings ingest to identical pA signals."""
    ds, path = _dataset(tmp_path, compression)
    back = dict(fast5.read_fast5(path))
    assert set(back) == {r.name for r in ds.reads}
    _, ref_path = _dataset(tmp_path, "none")
    ref = dict(fast5.read_fast5(ref_path))
    for name in ref:
        assert np.array_equal(back[name], ref[name]), name


def test_vbz_dataset_carries_filter_id(tmp_path):
    """The written file genuinely advertises HDF5 filter 32020 (a system
    with the official plugin resolves the same id)."""
    import h5py

    _, path = _dataset(tmp_path, "vbz")
    with h5py.File(path, "r") as f:
        grp = f[next(iter(f))]
        dset = grp["Raw"]["Signal"]
        plist = dset.id.get_create_plist()
        ids = [plist.get_filter(i)[0] for i in range(plist.get_nfilters())]
        assert vbz.VBZ_FILTER_ID in ids


def test_cli_maps_vbz_fast5(tmp_path):
    """Full CLI on a vbz-compressed multi-read FAST5 with the real ONT
    group schema: index + map + correct mappings."""
    from rawalign_tpu import cli
    from rawalign_tpu.io import fasta
    from rawalign_tpu.pore_model import save_pore_model

    ds, path = _dataset(tmp_path, "vbz", n_reads=6)
    fasta.write_fasta(
        str(tmp_path / "ref.fa"), [(s.name, s.seq) for s in ds.seqs]
    )
    save_pore_model(str(tmp_path / "model.txt"), ds.model)
    rc = cli.main(
        ["-x", "viral", "-p", str(tmp_path / "model.txt"),
         "-d", str(tmp_path / "ref.idx.npz"), str(tmp_path / "ref.fa")]
    )
    assert rc == 0
    out = tmp_path / "out.paf"
    rc = cli.main(
        ["-x", "viral", "--dtw-evaluate-chains", "-o", str(out),
         str(tmp_path / "ref.idx.npz"), path]
    )
    assert rc == 0
    lines = out.read_text().strip().splitlines()
    assert len(lines) == 6
    mapped = [ln for ln in lines if ln.split("\t")[5] != "*"]
    assert len(mapped) >= 5
