"""The stage1 packed-layout codec is the single source of truth for
both engines (round-2 regression: the two engines' hand-duplicated
layouts drifted and broke every distributed anchor's qpos)."""

import inspect

import numpy as np
import pytest

from rawalign_tpu import config
from rawalign_tpu.config import MappingFlag
from rawalign_tpu.index import index as dindex
from rawalign_tpu.map import stage1_codec
from rawalign_tpu.map import engine as dengine
from rawalign_tpu.parallel import mesh as pmesh
from rawalign_tpu.parallel.dist_engine import DistributedMappingEngine
from rawalign_tpu.testing import synth


def test_qc_roundtrip_exhaustive_bounds():
    rng = np.random.default_rng(0)
    qpos = rng.integers(0, stage1_codec.QPOS_LIMIT, 4096).astype(np.int32)
    cnt = rng.integers(0, stage1_codec.COUNT_LIMIT, 4096).astype(np.int32)
    q2, c2 = stage1_codec.unpack_qc(stage1_codec.pack_qc(qpos, cnt))
    np.testing.assert_array_equal(q2, qpos)
    np.testing.assert_array_equal(c2, cnt)
    # the exact corner values
    q = np.int32(stage1_codec.QPOS_LIMIT - 1)
    c = np.int32(stage1_codec.COUNT_LIMIT - 1)
    q2, c2 = stage1_codec.unpack_qc(stage1_codec.pack_qc(q, c))
    assert (int(q2), int(c2)) == (int(q), int(c))


def test_validate_bounds_rejects_out_of_range():
    stage1_codec.validate_bounds(512, 256)  # defaults-scale: fine
    with pytest.raises(ValueError, match="max_events_per_chunk"):
        stage1_codec.validate_bounds(stage1_codec.QPOS_LIMIT, 256)
    with pytest.raises(ValueError, match="max_occ"):
        stage1_codec.validate_bounds(512, stage1_codec.COUNT_LIMIT)


def test_engine_rejects_unpackable_config():
    """ADVICE r2: misconfiguration must fail loudly at construction,
    not corrupt anchors silently."""
    ds = synth.make_dataset(seed=3, genome_lengths=[4000], n_reads=1)
    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.max_events_per_chunk = stage1_codec.QPOS_LIMIT  # too big to pack
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    with pytest.raises(ValueError, match="max_events_per_chunk"):
        dengine.MappingEngine(idx, mo, batch_size=4)
    mo.max_events_per_chunk = 256
    with pytest.raises(ValueError, match="max_occ"):
        dengine.MappingEngine(
            idx, mo, batch_size=4, max_occ=stage1_codec.COUNT_LIMIT
        )


def test_unpack_rejects_width_mismatch():
    packed = np.zeros((2, 100), np.float32)
    with pytest.raises(ValueError, match="layout drift"):
        stage1_codec.unpack_stage1(
            packed, ne=64, ns=32, events_on_host=True
        )


def test_no_handwritten_packing_outside_codec():
    """Neither engine may hand-roll the (qpos, count) bit packing: the
    literal shift pattern exists only in stage1_codec."""
    from rawalign_tpu.parallel import dist_engine

    for mod in (dengine, dist_engine):
        src = inspect.getsource(mod)
        assert "<< 16" not in src, mod.__name__
        assert ">> 16" not in src, mod.__name__
        assert "0xFFFF" not in src.replace("0xFFFFFFFF", ""), mod.__name__


def test_stage1_cross_engine_equality():
    """The distributed stage1 (all-to-all routed lookup) must produce
    BIT-IDENTICAL unpacked (lo, qpos, count, scalars) to the
    single-device stage1 on the same inputs — the packing-level
    cross-check the round-2 regression lacked."""
    ds = synth.make_dataset(
        seed=11, genome_lengths=[9000, 5000], n_reads=8,
        read_len_bp=(150, 300),
    )
    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(MappingFlag.DTW_OUTPUT_CIGAR)  # force events_on_host=True
    mo.max_events_per_chunk = 256
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)

    B = 8
    L = mo.chunk_size
    packed_in = np.zeros((B, L + 1), np.float32)
    for i, r in enumerate(ds.reads[:B]):
        part = r.signal[:L]
        packed_in[i, : part.size] = part
        packed_in[i, L] = part.size

    import jax.numpy as jnp

    # device stage1: this test drives the signal-input _stage1 directly
    # (hybrid's _stage1_hy takes pre-detected events instead)
    eng1 = dengine.MappingEngine(idx, mo, batch_size=B, stage1_impl="device")
    hist = jnp.zeros((B, eng1._hmax), jnp.float32)
    off = np.zeros(B, np.int32)
    out1, _ = eng1._stage1(packed_in, hist, off)
    s1 = stage1_codec.unpack_stage1(
        np.asarray(out1), ne=mo.max_events_per_chunk, ns=eng1._ns_out,
        events_on_host=True,
    )

    mesh = pmesh.make_mesh(2, 4)
    eng2 = DistributedMappingEngine(idx, mo, mesh, batch_size=B)
    hist2 = jnp.zeros((B, eng2._hmax), jnp.float32)
    out2, _ = eng2._stage1(packed_in, hist2, off)
    s2 = stage1_codec.unpack_stage1(
        np.asarray(out2), ne=mo.max_events_per_chunk, ns=eng2._ns_out,
        events_on_host=True,
    )

    np.testing.assert_array_equal(s2.count, s1.count)
    # lo is only defined where count > 0 (the host expansion never
    # reads it elsewhere; dead-routed seeds carry an arbitrary lo)
    used = s1.count > 0
    np.testing.assert_array_equal(s2.lo[used], s1.lo[used])
    np.testing.assert_array_equal(s2.qpos[used], s1.qpos[used])
    np.testing.assert_array_equal(s2.n_events, s1.n_events)
    np.testing.assert_array_equal(s2.n_occ_dropped, s1.n_occ_dropped)
    np.testing.assert_array_equal(
        s2.n_compact_dropped, s1.n_compact_dropped
    )
    np.testing.assert_allclose(s2.ev_values, s1.ev_values, rtol=0, atol=0)
