"""Batched svb16 (VBZ container) encode/decode in JAX.

TPU-first formulation of the reference's svb16 kernels
(press/svb16/encode_scalar.c, decode_scalar.c — the SIMD loops become
two-phase map / prefix-sum / scatter over a read batch):

  encode: per-value byte length (1 or 2) -> exclusive row cumsum ->
          scatter value bytes; key bitmap via packbits; stream assembly
          (keys ++ data with per-row dynamic key length) via a gather.
  decode: key bitmap -> lengths -> offsets -> gather bytes -> fuse
          unzigzag + wrapping prefix sum.

Streams equal honours_tpu.kernels.svb.svb16_encode byte-for-byte (and
hence the reference C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.transforms.core import jnp_unzigdelta, jnp_zigdelta


def _keys_from_bits(two: jnp.ndarray) -> jnp.ndarray:
    """[B, L] 0/1 -> [B, L//8] key bytes, LSB-first per byte."""
    B, L = two.shape
    bits = two.reshape(B, L // 8, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.int32)).reshape(1, 1, 8)
    return (bits * weights).sum(axis=2).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("zd",))
def svb16_encode_batch(sig: jnp.ndarray, n: jnp.ndarray, zd: bool = True):
    """Encode [B, L] int16 with lengths n -> (stream [B, L//8 + 2L] u8,
    out_len [B]).  L must be a multiple of 8."""
    B, L = sig.shape
    KL = L // 8
    if zd:
        v = jnp_zigdelta(sig)  # int32, uint16-valued
    else:
        v = sig.astype(jnp.int32) & 0xFFFF
    pos = jnp.arange(L, dtype=jnp.int32)
    valid = pos[None, :] < n[:, None]
    v = jnp.where(valid, v, 0)
    two = ((v >= 256) & valid).astype(jnp.int32)
    keys = _keys_from_bits(two)

    lens = jnp.where(valid, two + 1, 0)
    ends = jnp.cumsum(lens, axis=1)
    offs = ends - lens
    data_len = ends[:, -1]

    # scatter bytes into [B, 2L] (+1 trash column for padded lanes)
    data = jnp.zeros((B, 2 * L + 1), dtype=jnp.uint8)
    tgt0 = jnp.where(valid, offs, 2 * L)
    tgt1 = jnp.where(valid & (two == 1), offs + 1, 2 * L)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    data = data.at[rows, tgt0].set((v & 0xFF).astype(jnp.uint8), mode="drop")
    data = data.at[rows, tgt1].set((v >> 8).astype(jnp.uint8), mode="drop")
    data = data[:, : 2 * L]

    # assemble keys ++ data with per-row key length ceil(n/8)
    kl = (n + 7) // 8
    out_cols = jnp.arange(KL + 2 * L, dtype=jnp.int32)[None, :]
    in_keys = out_cols < kl[:, None]
    key_idx = jnp.clip(out_cols, 0, KL - 1)
    data_idx = jnp.clip(out_cols - kl[:, None], 0, 2 * L - 1)
    stream = jnp.where(
        in_keys,
        jnp.take_along_axis(keys, key_idx, axis=1),
        jnp.take_along_axis(data, data_idx, axis=1),
    )
    return stream, kl + data_len


@functools.partial(jax.jit, static_argnames=("L", "zd"))
def svb16_decode_batch(stream: jnp.ndarray, n: jnp.ndarray, L: int, zd: bool = True):
    """Decode [B, M] u8 with lengths n -> [B, L] int16 (padded lanes 0)."""
    B, M = stream.shape
    pos = jnp.arange(L, dtype=jnp.int32)
    valid = pos[None, :] < n[:, None]
    kl = (n + 7) // 8
    # key bit for value j: stream[j >> 3] >> (j & 7)
    key_bytes = jnp.take_along_axis(
        stream, jnp.minimum(pos[None, :] >> 3, M - 1), axis=1
    ).astype(jnp.int32)
    two = (key_bytes >> (pos[None, :] & 7)) & 1
    two = jnp.where(valid, two, 0)
    lens = jnp.where(valid, two + 1, 0)
    ends = jnp.cumsum(lens, axis=1)
    offs = ends - lens + kl[:, None]
    b0 = jnp.take_along_axis(stream, jnp.minimum(offs, M - 1), axis=1).astype(
        jnp.int32
    )
    b1 = jnp.take_along_axis(stream, jnp.minimum(offs + 1, M - 1), axis=1).astype(
        jnp.int32
    )
    v = jnp.where(two == 1, b0 | (b1 << 8), b0)
    v = jnp.where(valid, v, 0)
    if zd:
        out = jnp_unzigdelta(v)
    else:
        out = (v - ((v & 0x8000) << 1)).astype(jnp.int16)
    return jnp.where(valid, out, 0).astype(jnp.int16)
