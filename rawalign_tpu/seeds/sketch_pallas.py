"""Fused Pallas sketch-scan kernel (TPU).

Replaces ``seeds.sketch._sketch_scan``'s ``lax.scan`` over the event
axis (adjacent-similar suppression + rolling quantized pack + kept-ring,
reference rsketch.c:146-284) with one on-chip loop, exactly like
``signal.events_pallas`` does for the event detector: the XLA scan pays
~10 us dispatch per step (~35 ms per chunk batch at NE=2048); in-kernel
the same step is ~25 vector ops (~0.3 ms per 128-read lane tile).

The kernel consumes pre-quantized codes (quantize_u32 is elementwise and
stays in XLA) and emits, per event slot:
  * the rolling packed accumulator (uint32, before hashing — hash64_u32
    stays vectorized in XLA);
  * a packed int32 of (emit bit | kept_count<<1 | oldest_ring_pos<<14),
    13 bits each (NE < 8192 asserted).

Semantics are transcribed 1:1 from sketch._sketch_scan (which remains
the CPU / interpret-mode reference and is golden-tested against the
compiled reference rsketch.c).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rawalign_tpu.seeds.sketch import LAST_SIG_DIFF, RI_MASK_SIGNAL


def _make_kernel(NE, e, quant_bit, mask_events):
    def kernel(ev_ref, tq_ref, n_ref, acc_ref, meta_ref, z_ref):
        n_events = n_ref[0]  # (1, 128) int32
        # zero init vectors via a VMEM round trip (constants get a
        # replicated layout that cannot join the fori_loop carry — see
        # signal.events_pallas)
        z_ref[:] = jnp.zeros((1, 128), jnp.float32)
        zerosf = z_ref[:]
        zeros = zerosf.astype(jnp.int32)
        last0 = ev_ref[0, 0:1, :]  # C: l_sigpos starts at event 0

        def body(i, carry):
            last_val, acc, cnt, ring = carry
            val = ev_ref[0, pl.ds(i, 1), :]
            tqv = tq_ref[0, pl.ds(i, 1), :]
            valid = i < n_events
            similar = jnp.abs(val - last_val) < LAST_SIG_DIFF
            masked = val == RI_MASK_SIGNAL
            keep = valid & ~masked & ((i == 0) | ~similar)
            new_last = jnp.where(keep, val, last_val)
            new_acc = jnp.where(
                keep,
                ((acc << quant_bit) | tqv) & jnp.int32(mask_events),
                acc,
            )
            new_cnt = cnt + keep.astype(jnp.int32)
            iv = zeros + i
            new_ring = tuple(
                jnp.where(keep, nxt, cur)
                for cur, nxt in zip(ring, ring[1:] + (iv,))
            )
            emit = keep & (new_cnt >= e)
            acc_ref[pl.ds(i, 1), :] = new_acc
            meta_ref[pl.ds(i, 1), :] = (
                emit.astype(jnp.int32)
                | (new_cnt << 1)
                | (new_ring[0] << 14)
            )
            return (new_last, new_acc, new_cnt, new_ring)

        jax.lax.fori_loop(
            0, NE, body, (last0, zeros, zeros, tuple([zeros] * e))
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("e", "quant_bit", "interpret"))
def sketch_scan_pallas(
    events: jax.Array,  # (B, NE) float32
    tq: jax.Array,  # (B, NE) uint32 quantized codes
    n_events: jax.Array,  # (B,) int32
    *,
    e: int,
    quant_bit: int,
    interpret: bool = False,
):
    """Returns (accs (B, NE) uint32, emit (B, NE) bool,
    oldest (B, NE) int32, cnt (B, NE) int32) — drop-in for the carry
    outputs of sketch._sketch_scan."""
    B, NE = events.shape
    assert NE < (1 << 13), "packed meta encoding assumes NE < 8192"
    nbits = quant_bit * e
    mask_events = (1 << nbits) - 1 if nbits < 32 else 0xFFFFFFFF
    G = -(-B // 128)
    Bp = G * 128
    ev_p = jnp.zeros((Bp, NE), jnp.float32).at[:B].set(events)
    tq_p = jnp.zeros((Bp, NE), jnp.int32).at[:B].set(tq.astype(jnp.int32))
    n_p = jnp.zeros((Bp,), jnp.int32).at[:B].set(n_events)
    ev_t = ev_p.reshape(G, 128, NE).transpose(0, 2, 1)
    tq_t = tq_p.reshape(G, 128, NE).transpose(0, 2, 1)
    n_t = n_p.reshape(G, 1, 128)

    kernel = _make_kernel(NE, e, quant_bit, mask_events)
    acc, meta = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, NE, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NE, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 128), lambda g: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((NE, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NE, 128), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G * NE, 128), jnp.int32),
            jax.ShapeDtypeStruct((G * NE, 128), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(ev_t, tq_t, n_t)

    acc = acc.reshape(G, NE, 128).transpose(0, 2, 1).reshape(Bp, NE)[:B]
    meta = meta.reshape(G, NE, 128).transpose(0, 2, 1).reshape(Bp, NE)[:B]
    emit = (meta & 1) == 1
    cnt = (meta >> 1) & 0x1FFF
    oldest = (meta >> 14) & 0x1FFF
    return acc.astype(jnp.uint32), emit, oldest, cnt
