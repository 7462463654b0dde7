"""Batched event sketching on device (JAX).

TPU reformulation of the reference's plain (every-event) sketch mode
(src/rsketch.c:223-274): the adjacent-similar suppression + rolling pack
are a single short ``lax.scan`` over the event axis (sequential carry:
last kept value and packed accumulator), everything else — bit-level
quantization and the hash — is vectorized.

Width note: the packed code spans quant_bit*e bits (up to 50 for e=10),
but the reference hashes it with hash64 masked to 32 bits
(rsketch.c:6-15,255): the first hash step is ``(~key + (key<<21)) & (2^32-1)``,
which reads only bits 0..31 (for ~key) and 0..10 (for key<<21) of the
packed code — the hash depends ONLY on its low 32 bits. The device pack
therefore tracks a uint32 accumulator and matches the reference hashes
bit-for-bit without 64-bit integers (which TPUs lack natively).

Minimizer-window mode (w>0, rsketch.c:146-221) is used by the 'faster'
preset for indexing; the index is built on host where the golden
implementation serves. Device-side minimizer query support: windowed
minimum over the emitted (hash, pos) stream, see sketch_events_min.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LAST_SIG_DIFF = np.float32(0.3)
RI_MASK_SIGNAL = np.float32(3.402823466e32)


class SeedBatch(NamedTuple):
    hashes: jax.Array  # (B, NE) uint32 seed hash values
    qpos: jax.Array  # (B, NE) int32 event index of the seed (newest event)
    valid: jax.Array  # (B, NE) bool


def _u32(x: int) -> jnp.ndarray:
    return jnp.uint32(x & 0xFFFFFFFF)


def hash64_u32(key: jax.Array) -> jax.Array:
    """hash64 masked to 32 bits (rsketch.c:6-15) in uint32 arithmetic."""
    key = key.astype(jnp.uint32)
    key = (~key) + (key << _u32(21))
    key = key ^ (key >> _u32(24))
    key = key + (key << _u32(3)) + (key << _u32(8))
    key = key ^ (key >> _u32(14))
    key = key + (key << _u32(2)) + (key << _u32(4))
    key = key ^ (key >> _u32(28))
    key = key + (key << _u32(31))
    return key


def quantize_u32(values: jax.Array, q: int, lq: int) -> jax.Array:
    """Bit-level quantization (rsketch.c:178): top-2 bits of the float's
    raw encoding next to lq bits taken from below the top q bits."""
    bits = jax.lax.bitcast_convert_type(
        values.astype(jnp.float32), jnp.uint32
    )
    mask_lq = _u32((1 << lq) - 1)
    return ((bits >> _u32(30)) << _u32(lq)) | ((bits >> _u32(32 - q)) & mask_lq)


@functools.partial(jax.jit, static_argnames=("e", "q", "lq"))
def sketch_events_batch(
    events: jax.Array,
    n_events: jax.Array,
    *,
    e: int,
    q: int,
    lq: int,
) -> SeedBatch:
    """Plain-mode sketching of a batch of event chunks.

    events: (B, NE) float32 normalized event values (zero-padded).
    n_events: (B,) int32.

    Seed s at output slot i covers kept events (i-e+1..i in kept order)
    and reports the NEWEST event's index as its position, exactly like
    ri_sketch_reg (rsketch.c:251-264).
    """
    B, NE = events.shape
    quant_bit = lq + 2
    nbits = quant_bit * e
    mask_events = _u32((1 << nbits) - 1 if nbits < 32 else 0xFFFFFFFF)
    tq = quantize_u32(events, q, lq)
    idx = jnp.arange(NE, dtype=jnp.int32)
    in_range = idx[None, :] < n_events[:, None]

    def step(carry, xs):
        last_val, acc, kept_cnt = carry
        val, tqv, valid, i = xs
        # C semantics (rsketch.c:243): index 0 bypasses the similarity
        # check; the comparison value l_sigpos starts at index 0 whether or
        # not event 0 was kept, and updates only on keeps.
        similar = jnp.abs(val - last_val) < LAST_SIG_DIFF
        masked = val == RI_MASK_SIGNAL
        keep = valid & ~masked & ((i == 0) | ~similar)
        new_last = jnp.where(keep, val, last_val)
        new_acc = jnp.where(
            keep, ((acc << _u32(quant_bit)) | tqv) & mask_events, acc
        )
        new_cnt = kept_cnt + keep.astype(jnp.int32)
        emit = keep & (new_cnt >= e)
        return (new_last, new_acc, new_cnt), (new_acc, emit)

    init = (
        events[:, 0].astype(jnp.float32),
        jnp.zeros(B, jnp.uint32),
        jnp.zeros(B, jnp.int32),
    )
    _, (accs, emits) = jax.lax.scan(
        step,
        init,
        (events.T, tq.T, in_range.T, idx),
        unroll=8,
    )
    hashes = hash64_u32(accs.T)
    return SeedBatch(
        hashes=jnp.where(emits.T, hashes, 0),
        qpos=jnp.broadcast_to(idx[None, :], (B, NE)),
        valid=emits.T,
    )
