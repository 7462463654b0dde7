"""Multi-chip sharding tests on the virtual 8-device CPU mesh:
replicated-index data parallelism and hash-range-sharded index with
psum hit combination must reproduce the single-device results."""

import numpy as np
import pytest

import jax

from rawalign_tpu import config
from rawalign_tpu.index import index as dindex
from rawalign_tpu.parallel import mesh as pmesh
from rawalign_tpu.testing import synth


@pytest.fixture(scope="module")
def setup():
    ds = synth.make_dataset(
        seed=21,
        genome_lengths=[8_000],
        n_reads=8,
        read_len_bp=(250, 450),
        noise_pa=1.2,
    )
    io = config.IndexOptions()
    mo = config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.max_events_per_chunk = 512
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    return ds, idx, io, mo


def _chunks(ds, mo, B=8):
    L = mo.chunk_size
    chunks = np.zeros((B, L), dtype=np.float32)
    lengths = np.zeros(B, dtype=np.int32)
    for i in range(B):
        sig = ds.reads[i % len(ds.reads)].signal[:L]
        chunks[i, : sig.size] = sig
        lengths[i] = sig.size
    return chunks, lengths


@pytest.mark.parametrize("n_data,n_shard", [(8, 1), (4, 2), (2, 4)])
def test_sharded_step_matches_across_layouts(setup, n_data, n_shard):
    ds, idx, io, mo = setup
    assert len(jax.devices()) >= 8
    chunks, lengths = _chunks(ds, mo)
    results = {}
    mesh = pmesh.make_mesh(n_data, n_shard)
    keys_sh, id_sh, ps_sh, bounds = pmesh.shard_index_by_hash_range(
        idx.keys, idx.val_id, idx.val_ps, n_shard
    )
    step = pmesh.build_mapping_step(
        mesh, io_opt=io, mo_opt=mo, max_occ=16, max_anchors=512
    )
    out = step(chunks, lengths, keys_sh, id_sh, ps_sh, bounds)
    ev_vals, ev_counts, seg, tgt, qry, scores, preds = map(np.asarray, out)
    results = (ev_counts, seg, tgt, qry, scores)
    # compare against the single-logical-device layout (1 data x 1 shard)
    mesh1 = pmesh.make_mesh(1, 1)
    k1, i1, p1, b1 = pmesh.shard_index_by_hash_range(
        idx.keys, idx.val_id, idx.val_ps, 1
    )
    step1 = pmesh.build_mapping_step(
        mesh1, io_opt=io, mo_opt=mo, max_occ=16, max_anchors=512
    )
    out1 = step1(chunks, lengths, k1, i1, p1, b1)
    ref = tuple(map(np.asarray, out1))
    np.testing.assert_array_equal(ev_counts, ref[1])
    np.testing.assert_array_equal(seg, ref[2])
    np.testing.assert_array_equal(tgt, ref[3])
    np.testing.assert_array_equal(qry, ref[4])
    np.testing.assert_allclose(scores, ref[5], atol=1e-4)
