"""Reference binary index format round trip."""

import numpy as np

from rawalign_tpu import config
from rawalign_tpu.index import index as dindex
from rawalign_tpu.index.ref_format import dump_reference_index, load_reference_index
from rawalign_tpu.testing import synth


def test_reference_format_roundtrip(tmp_path):
    ds = synth.make_dataset(
        seed=4, genome_lengths=[5000, 3000], n_reads=1
    )
    io = config.IndexOptions()
    config.set_opt("viral", io, config.MappingOptions())
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    path = str(tmp_path / "ref.ind")
    dump_reference_index(idx, path)
    back = load_reference_index(path)
    assert back.seq_names == idx.seq_names
    np.testing.assert_array_equal(back.seq_lens, idx.seq_lens)
    np.testing.assert_array_equal(back.sig_lens, idx.sig_lens)
    assert (back.opt.w, back.opt.e, back.opt.q, back.opt.lq, back.opt.k) == (
        io.w, io.e, io.q, io.lq, io.k,
    )
    np.testing.assert_array_equal(back.keys, idx.keys)
    np.testing.assert_array_equal(back.val_id, idx.val_id)
    np.testing.assert_array_equal(back.val_ps, idx.val_ps)
    np.testing.assert_allclose(back.signals_s1, idx.signals_s1)
    np.testing.assert_allclose(back.signals_s0, idx.signals_s0)
    # query parity through the hash table path
    for h in idx.keys[:50]:
        np.testing.assert_array_equal(back.get(int(h)), idx.get(int(h)))
