"""Batched classical Stream-VByte (32-bit "1234" and "0124") in JAX.

TPU formulation of press/streamvbyte/src/streamvbyte_encode.c:36-60 and
streamvbyte_0124_encode.c:8-28: the 1-4 (or 0/1/2/4) little-endian value
bytes are interleaved at fixed candidate positions [4j .. 4j+3] and
packed left with the monotone compaction walk (engine/permute.py);
decode expands them back onto the candidate grid.  2-bit length codes
pack 4-per-byte LSB-first into the key section.

Streams equal honours_tpu.kernels.svb.svb{32,0124}_encode byte-for-byte.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from honours_tpu.engine.permute import (
    compaction_shifts,
    monotone_compact,
    monotone_expand,
    rowwise_concat,
    rowwise_shift_left,
)

U32 = jnp.uint32


def _nbytes_and_codes(v, variant: str):
    """Per-value byte count and 2-bit key code."""
    if variant == "1234":
        nb = (
            1
            + (v >= (1 << 8)).astype(jnp.int32)
            + (v >= (1 << 16)).astype(jnp.int32)
            + (v >= (1 << 24)).astype(jnp.int32)
        )
        return nb, nb - 1
    # 0124: lengths {0,1,2,4}, codes {0,1,2,3}
    code = (
        (v >= 1).astype(jnp.int32)
        + (v >= (1 << 8)).astype(jnp.int32)
        + (v >= (1 << 16)).astype(jnp.int32)
    )
    nb = code + (code == 3).astype(jnp.int32)  # {0,1,2,3} -> {0,1,2,4}
    return nb, code


def _keys_from_codes(codes, N: int):
    """[B, N] 2-bit codes -> [B, N//4] key bytes, LSB-first pairs."""
    B = codes.shape[0]
    c = codes.reshape(B, N // 4, 4)
    w = (1 << (2 * jnp.arange(4, dtype=jnp.int32))).reshape(1, 1, 4)
    return (c * w).sum(axis=2).astype(jnp.uint8)


def _interleave4(parts):
    """4x [B, N] -> [B, 4N] with parts[k] at columns 4j+k."""
    B, N = parts[0].shape
    return jnp.stack(parts, axis=2).reshape(B, 4 * N)


@functools.partial(jax.jit, static_argnames=("variant",))
def svb32_encode_batch(values, n, variant: str = "1234"):
    """Encode [B, N] uint32 (first n valid) -> (stream [B, M] u8, len [B]).

    N must be a multiple of 4 (key bytes pack 4 codes).
    """
    B, N = values.shape
    assert N % 4 == 0, N
    v = values.astype(U32)
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    v = jnp.where(valid, v, 0)
    nb, codes = _nbytes_and_codes(v, variant)
    nb = jnp.where(valid, nb, 0)
    codes = jnp.where(valid, codes, 0)
    keys = _keys_from_codes(codes, N)

    bytes_k = [
        ((v >> jnp.uint32(8 * k)) & jnp.uint32(0xFF)).astype(jnp.uint8)
        for k in range(4)
    ]
    keep_k = [valid & (nb > k) for k in range(4)]
    kl = (n + 3) // 4
    # keys ++ data in ONE compaction (see svb16.py note)
    kcols = jnp.arange(N // 4, dtype=jnp.int32)[None, :]
    cat = jnp.concatenate(
        [jnp.where(kcols < kl[:, None], keys, 0), _interleave4(bytes_k)],
        axis=1,
    )
    keepc = jnp.concatenate([kcols < kl[:, None], _interleave4(keep_k)], axis=1)
    stream, total = monotone_compact(cat, keepc)
    return stream, total


@functools.partial(jax.jit, static_argnames=("N", "variant"))
def svb32_decode_batch(stream, n, N: int, variant: str = "1234"):
    """Decode [B, M] u8 (stream at col 0, first n values) -> [B, N] u32."""
    B, M = stream.shape
    assert N % 4 == 0, N
    KL = N // 4
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    kl = (n + 3) // 4
    keys = stream[:, :KL].astype(jnp.int32)
    krep = jnp.repeat(keys, 4, axis=1)
    codes = (krep >> (2 * (pos & 3))) & 3
    codes = jnp.where(valid, codes, 0)
    if variant == "1234":
        nb = codes + 1
    else:
        nb = codes + (codes == 3).astype(jnp.int32)
    nb = jnp.where(valid, nb, 0)

    data = rowwise_shift_left(stream, kl, 4 * N)
    keep = _interleave4([valid & (nb > k) for k in range(4)])
    shift, cnt = compaction_shifts(keep)
    rk = jnp.arange(4 * N, dtype=jnp.int32)[None, :]
    validc = rk < cnt[:, None]
    # u8 expand routes to the Pallas walk on TPU (see svb16.py note)
    grid, _ = monotone_expand(data, shift, validc, 4 * N)

    b = [grid[:, k::4].astype(U32) for k in range(4)]
    v = b[0] | (b[1] << 8) | (b[2] << 16) | (b[3] << 24)
    return jnp.where(valid, v, 0)
