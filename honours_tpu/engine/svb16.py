"""Batched svb16 (VBZ container) encode/decode in JAX — gather/scatter-free.

TPU-first formulation of the reference's svb16 kernels
(press/svb16/encode_scalar.c, decode_scalar.c).  XLA's general
gather/scatter run at ~100M elem/s on TPU, so instead of the textbook
"prefix-sum offsets then scatter" scheme the byte stream is built as a
*monotone compaction*: lo/hi candidate bytes are interleaved at fixed
positions [2j, 2j+1] and packed left with the O(log N) shift walk
(engine/permute.py).  Decode is the exact inverse: expand the compacted
bytes back onto the candidate grid.

Streams equal honours_tpu.kernels.svb.svb16_encode byte-for-byte (and
hence the reference C).
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
from honours_tpu.transforms.core import jnp_unzigdelta, jnp_zigdelta

import os

_FUSED_ENABLED = os.environ.get("HTPU_SVB16_FUSED", "1") != "0"


def _keys_from_bits(two: jnp.ndarray) -> jnp.ndarray:
    """[B, L] 0/1 -> [B, L//8] key bytes, LSB-first per byte."""
    B, L = two.shape
    bits = two.reshape(B, L // 8, 8)
    weights = (1 << jnp.arange(8, dtype=jnp.int32)).reshape(1, 1, 8)
    return (bits * weights).sum(axis=2).astype(jnp.uint8)


def _interleave2(a, b):
    """[B, L] x2 -> [B, 2L] with a at even, b at odd columns."""
    B, L = a.shape
    return jnp.stack([a, b], axis=2).reshape(B, 2 * L)


#: largest L the fused kernels take: beyond 128Ki the per-block VMEM
#: working set ([R, 2L]-wide walk intermediates) exceeds the chip and
#: Mosaic compile time explodes (a 512Ki compile ran >20 min before
#: being killed); the walk route's XLA fallback handles the long tail
MAX_FUSED_L = 1 << 17


def _fused(L: int):
    """TPU route: the fully-fused Mosaic kernels (svb16_fused.py) — the
    whole codec in one kernel per direction instead of XLA glue around a
    walk kernel.  Byte-identical streams; chip parity verified round 4
    (tools/chip_svb16_parity.py: ragged n, L in {4Ki,16Ki,64Ki}, both
    zd modes; driver-style measurement at [256, 64Ki]: 10.3 GB/s enc /
    8.2 GB/s dec vs 6.8/2.8 for the XLA+walk route — decode >= 2.9x and
    now within ~25% of encode).  Set HTPU_SVB16_FUSED=0 to force
    the old route (read once at import)."""
    if not _FUSED_ENABLED or L > MAX_FUSED_L:
        return None
    if jax.default_backend() != "tpu":
        return None
    from honours_tpu.engine import svb16_fused

    return svb16_fused


@functools.partial(jax.jit, static_argnames=("zd",))
def svb16_encode_batch(sig: jnp.ndarray, n: jnp.ndarray, zd: bool = True):
    """Encode [B, L] int16 with lengths n -> (stream [B, L//8 + 2L] u8,
    out_len [B]).  L must be a multiple of 8."""
    B, L = sig.shape
    sf = _fused(L)
    if sf is not None:
        return sf.svb16_encode_fused(sig, n, zd=zd)
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

    cand = _interleave2((v & 0xFF).astype(jnp.uint8), (v >> 8).astype(jnp.uint8))
    keep = _interleave2(valid, valid & (two == 1))
    kl = (n + 7) // 8
    # keys ++ data in ONE compaction (concatenation IS a compaction —
    # see permute.rowwise_concat): saves a whole walk vs compacting the
    # data then concatenating the ragged key area in a second pass.
    kcols = jnp.arange(KL, dtype=jnp.int32)[None, :]
    cat = jnp.concatenate([jnp.where(kcols < kl[:, None], keys, 0), cand],
                          axis=1)
    keepc = jnp.concatenate([kcols < kl[:, None], keep], axis=1)
    stream, total = monotone_compact(cat, keepc)
    return stream, total


@functools.partial(jax.jit, static_argnames=("L", "zd"))
def svb16_decode_batch(stream: jnp.ndarray, n: jnp.ndarray, L: int, zd: bool = True):
    """Decode [B, M] u8 with lengths n -> [B, L] int16 (padded lanes 0)."""
    B, M = stream.shape
    sf = _fused(L)
    if sf is not None:
        return sf.svb16_decode_fused(stream, n, L, zd=zd)
    KL = L // 8
    pos = jnp.arange(L, dtype=jnp.int32)
    valid = pos[None, :] < n[:, None]
    kl = (n + 7) // 8
    # keys live at fixed columns [0, kl); replicate each key byte 8x
    keys = stream[:, :KL].astype(jnp.int32)
    krep = jnp.repeat(keys, 8, axis=1)  # static repeat: cheap broadcast
    two = (krep >> (pos[None, :] & 7)) & 1
    two = jnp.where(valid, two, 0)
    if jax.default_backend() == "tpu":
        two = jax.lax.optimization_barrier(two)

    # strip the ragged key area so data starts at column 0
    data = rowwise_shift_left(stream, kl, 2 * L)

    # inverse of the encode compaction: expand data bytes onto the
    # candidate grid [B, 2L] (even = lo byte, odd = hi byte when two)
    keep = _interleave2(valid, valid & (two == 1))
    shift, cnt = compaction_shifts(keep)
    rk = jnp.arange(2 * L, dtype=jnp.int32)[None, :]
    validc = rk < cnt[:, None]
    # u8 expand: on TPU this routes to the VMEM-resident Pallas walk
    # (permute_pallas.py) — the XLA-fused u8 walk miscompiles at B=256
    # and stays disabled there (see permute.py).  Above the walk
    # kernels' MAX_COLS (L > 128Ki) the XLA path runs instead, where
    # fusing the walk with its producers ALSO miscompiles (reproduced at
    # [8, 1M]: one wrong byte mid-stream; primitives pass standalone) —
    # the barrier pins the walk inputs to materialized buffers.
    if jax.default_backend() == "tpu":
        data, shift, validc = jax.lax.optimization_barrier(
            (data, shift, validc)
        )
    grid, _ = monotone_expand(data, shift, validc, 2 * L)
    if jax.default_backend() == "tpu":
        grid = jax.lax.optimization_barrier(grid)

    b0 = grid[:, 0::2].astype(jnp.int32)
    b1 = grid[:, 1::2].astype(jnp.int32)
    v = jnp.where(two == 1, b0 | (b1 << 8), b0)
    v = jnp.where(valid, v, 0)
    if zd:
        out = jnp_unzigdelta(v)
    else:
        out = (v - ((v & 0x8000) << 1)).astype(jnp.int16)
    return jnp.where(valid, out, 0).astype(jnp.int16)
