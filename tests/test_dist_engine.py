"""Distributed mapping engine: PAF equality with the single-device
engine on virtual meshes (the multi-chip analog of the reference's
kt_for read parallelism, kthread.c:30-72; all-to-all seed routing per
SURVEY §5's distributed-backend design)."""

import re

import numpy as np
import pytest

from rawalign_tpu import config
from rawalign_tpu.config import MappingFlag
from rawalign_tpu.index import index as dindex
from rawalign_tpu.io import paf
from rawalign_tpu.map import engine as dengine
from rawalign_tpu.parallel import mesh as pmesh
from rawalign_tpu.parallel.dist_engine import DistributedMappingEngine
from rawalign_tpu.testing import synth


def _strip_mt(line: str) -> str:
    return re.sub(r"\tmt:f:[^\t]*", "", line)


@pytest.fixture(scope="module")
def setup():
    ds = synth.make_dataset(
        seed=7,
        genome_lengths=[12000, 6000],
        n_reads=12,
        read_len_bp=(150, 350),
    )
    io, mo = config.IndexOptions(), config.MappingOptions()
    config.set_opt("viral", io, mo)
    mo.set_flag(MappingFlag.DTW_EVALUATE_CHAINS)
    mo.max_events_per_chunk = 256
    idx = dindex.build_index(ds.seqs, ds.model.pore_vals, io)
    reads = [(r.name, r.signal) for r in ds.reads]
    # add a pure-noise read so the unmapped path crosses the mesh too
    rng = np.random.default_rng(0)
    reads.append(("noise", rng.normal(95, 15, 9000).astype(np.float32)))
    # both engines use the default stage1 (hybrid when the native lib
    # is built, device otherwise): the distributed engine resolves the
    # same 'auto' default, so single-chip and mesh runs share detector
    # semantics and the PAF must be identical
    eng1 = dengine.MappingEngine(idx, mo, batch_size=16)
    ref_lines = sorted(
        _strip_mt(paf.paf_line(r)) for r in eng1.map_reads(iter(reads))
    )
    return idx, mo, reads, ref_lines


@pytest.mark.parametrize("layout", [(4, 2), (2, 4)])
def test_paf_equality(setup, layout):
    idx, mo, reads, ref_lines = setup
    mesh = pmesh.make_mesh(*layout)
    eng = DistributedMappingEngine(idx, mo, mesh, batch_size=16)
    lines = sorted(
        _strip_mt(paf.paf_line(r)) for r in eng.map_reads(iter(reads))
    )
    assert lines == ref_lines
    # every simulated read mapped, the noise read did not
    mapped = {ln.split("\t")[0] for ln in lines if ln.split("\t")[5] != "*"}
    assert "noise" not in mapped


def test_routing_matches_global_lookup():
    """The all-to-all routed sharded lookup returns exactly the global
    searchsorted (lo, count) for every shard count, including duplicate
    hash runs straddling naive cut points and empty shards."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    rng = np.random.default_rng(1)
    # heavy duplication to stress cut alignment
    keys = np.sort(
        rng.integers(0, 300, 513).astype(np.uint32)
    )
    B, NS, max_occ = 16, 24, 4
    hashes = rng.integers(0, 330, (B, NS)).astype(np.uint32)
    valid = rng.random((B, NS)) < 0.8

    lo_g = np.searchsorted(keys, hashes.reshape(-1), side="left").reshape(
        B, NS
    )
    hi_g = np.searchsorted(keys, hashes.reshape(-1), side="right").reshape(
        B, NS
    )
    cnt_g = hi_g - lo_g
    cnt_g = np.where(valid & (cnt_g <= max_occ), cnt_g, 0)

    for n_data, n_shard in [(4, 2), (2, 4), (1, 8)]:
        mesh = pmesh.make_mesh(n_data, n_shard)
        keys_sh, n_real, offs, cut_starts = pmesh.shard_keys_for_routing(
            keys, n_shard
        )
        S = n_shard
        cut_starts_j = jnp.asarray(cut_starts)

        def step(h, v, ksh, nr, off):
            b = h.shape[0]
            owner = jnp.clip(
                jnp.searchsorted(
                    cut_starts_j, h.reshape(-1), side="right"
                ).astype(jnp.int32)
                - 1,
                0,
                S - 1,
            ).reshape(h.shape)
            dest = jax.lax.broadcasted_iota(jnp.int32, (S, b, NS), 0)
            routed = jnp.where(
                (owner[None] == dest) & v[None],
                h[None],
                jnp.uint32(0xFFFFFFFF),
            )
            routed = jax.lax.all_to_all(
                routed, "shard", split_axis=0, concat_axis=0
            )
            flat = routed.reshape(-1)
            lo = jnp.searchsorted(ksh[0], flat, side="left").astype(
                jnp.int32
            )
            hi = jnp.searchsorted(ksh[0], flat, side="right").astype(
                jnp.int32
            )
            hi = jnp.minimum(hi, nr[0])
            cnt = jnp.maximum(hi - lo, 0).reshape(S, b, NS)
            glo = (lo + off[0]).reshape(S, b, NS)
            back = jax.lax.all_to_all(
                jnp.stack([glo, cnt], axis=1),
                "shard",
                split_axis=0,
                concat_axis=0,
            )
            glo_b = jnp.take_along_axis(back[:, 0], owner[None], axis=0)[0]
            cnt_b = jnp.take_along_axis(back[:, 1], owner[None], axis=0)[0]
            cnt_b = jnp.where(v & (cnt_b <= max_occ), cnt_b, 0)
            return glo_b, cnt_b

        f = jax.jit(
            jax.shard_map(
                step,
                mesh=mesh,
                in_specs=(
                    P(("data", "shard"), None),
                    P(("data", "shard"), None),
                    P("shard", None),
                    P("shard"),
                    P("shard"),
                ),
                out_specs=(
                    P(("data", "shard"), None),
                    P(("data", "shard"), None),
                ),
                check_vma=False,
            )
        )
        glo, cnt = f(hashes, valid, keys_sh, n_real, offs)
        glo, cnt = np.asarray(glo), np.asarray(cnt)
        assert (cnt == cnt_g).all(), (n_data, n_shard)
        sel = cnt_g > 0
        assert (glo[sel] == lo_g[sel]).all(), (n_data, n_shard)


def test_dist_engine_stage1_modes(setup):
    """The distributed engine supports both detectors: 'hybrid' (host-C
    events per host shard, golden parity) and 'device' (f32 detector in
    the shard_map). Each must be PAF-identical to the single-chip engine
    running the SAME detector."""
    from rawalign_tpu import native

    idx, mo, reads, _ref = setup
    mesh = pmesh.make_mesh(4, 2)
    for s1 in (["hybrid"] if native.events_available() else []) + ["device"]:
        eng1 = dengine.MappingEngine(idx, mo, batch_size=16, stage1_impl=s1)
        want = sorted(
            _strip_mt(paf.paf_line(r)) for r in eng1.map_reads(iter(reads))
        )
        eng = DistributedMappingEngine(
            idx, mo, mesh, batch_size=16, stage1_impl=s1
        )
        got = sorted(
            _strip_mt(paf.paf_line(r)) for r in eng.map_reads(iter(reads))
        )
        assert got == want, s1
