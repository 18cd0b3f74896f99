"""Batched TPU engine for ex-zd (`hasgam_vbsse21_zdq`), the production
slow5lib codec variant.

Pipeline (reference: press/ex_zd.c:403-457 ptr_compress_ex_zd_v0):
qts trailing-zero detection (OR-reduce, press/ex_zd.c:358-381) ->
arithmetic right shift -> zigzag-delta -> svb32-coded exception block
(positions as delta-1 lists, values as v-256 u32) + 1-byte residual.
All stages are existing engine machinery: the exception scan is the
shared monotone-compaction pattern (engine/vb_batch._ex_parts), the
position/value blobs ride the batched svb32 engine, and the residual
merge reuses vbbe21_fill_batch.

Streams are byte-exact with honours_tpu.codecs.exzd.ExZdCodec per row.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from honours_tpu.engine.bits import (
    monotone_place,
    read_u16le,
    read_u32le,
    rowwise_concat,
    u16le_bytes,
    u32le_bytes,
)
from honours_tpu.engine.permute import rowwise_shift_left
from honours_tpu.engine.svb32 import svb32_decode_batch, svb32_encode_batch
from honours_tpu.engine.vb_batch import _ex_parts
from honours_tpu.engine.vbbe21 import vbbe21_fill_batch

HDR = 12  # [ver:1][nin:u64 LE][q:1][zd0:u16]


def _qts_batch(sig, n):
    """Per-row largest q <= 5 with q trailing zero bits across all valid
    samples (press/ex_zd.c:358-381; empty rows -> 5 like the host)."""
    B, L = sig.shape
    u = sig.astype(jnp.int32) & 0xFFFF
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    orall = jnp.bitwise_or.reduce(jnp.where(valid, u, 0), axis=1)
    q = jnp.zeros((B,), jnp.int32)
    for k in range(1, 6):
        q = q + ((orall & ((1 << k) - 1)) == 0).astype(jnp.int32)
    return q


def _zigdelta_q(sig, n, q):
    """qts shift then zigzag-delta, all in masked int32/uint16 space."""
    B, L = sig.shape
    u = sig.astype(jnp.int32) & 0xFFFF
    s = u - ((u & 0x8000) << 1)          # sign-extended int16
    uq = (s >> q[:, None]) & 0xFFFF      # arithmetic shift, back to u16
    prev = jnp.pad(uq[:, :-1], ((0, 0), (1, 0)))
    d = (uq - prev) & 0xFFFF
    sign = (0x10000 - (d >> 15)) & 0xFFFF
    return ((d + d) & 0xFFFF) ^ sign


def _u64le_bytes(x):
    """[B] int32 -> [B, 8] u8 LE (counts < 2^31 so the high word is 0)."""
    B = x.shape[0]
    lo = u32le_bytes(x)
    return jnp.concatenate([lo, jnp.zeros((B, 4), jnp.uint8)], axis=1)


@functools.partial(jax.jit, static_argnames=("emax",))
def press_exzd_batch(sig, n, emax: int = None):
    """Batched hasgam_vbsse21_zdq encode -> (stream [B, M] u8, len [B]).

    `emax` caps the per-read exception buffers exactly like the vb
    engines; rows with nex > emax need the host fallback (the nex field
    at byte offset 12 is exact either way).
    """
    B, L = sig.shape
    emax = emax or L
    e4 = -(-emax // 4) * 4
    q = _qts_batch(sig, n)
    zd = _zigdelta_q(sig, n, q)
    zd0 = zd[:, 0]
    rest = jnp.concatenate([zd[:, 1:], jnp.zeros((B, 1), zd.dtype)], axis=1)
    p = _ex_parts(rest, n - 1, emax)
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), p["ex_pos"][:, :-1]], axis=1
    )
    pos_delta = jnp.pad(p["ex_pos"] - prev - 1, ((0, 0), (0, e4 - emax)))
    vals32 = jnp.pad((p["ex_val"] - 256) & 0xFFFF, ((0, 0), (0, e4 - emax)))
    pos_buf, pos_len = svb32_encode_batch(pos_delta.astype(jnp.uint32), p["nex"])
    val_buf, val_len = svb32_encode_batch(vals32.astype(jnp.uint32), p["nex"])
    many = p["nex"] > 1
    one = p["nex"] == 1
    raw1 = jnp.concatenate(
        [u32le_bytes(p["ex_pos"][:, 0]), u32le_bytes(vals32[:, 0])], axis=1
    )
    hdr = jnp.concatenate(
        [
            jnp.zeros((B, 1), jnp.uint8),          # version 0
            _u64le_bytes(n),                       # nin
            q.astype(jnp.uint8)[:, None],          # qts shift
            u16le_bytes(zd0),                      # first zigzag-delta
        ],
        axis=1,
    )
    segs = [
        (hdr, jnp.full((B,), HDR, jnp.int32)),
        (u32le_bytes(p["nex"]), jnp.full((B,), 4, jnp.int32)),
        (u32le_bytes(pos_len), jnp.where(many, 4, 0)),
        (pos_buf, jnp.where(many, pos_len, 0)),
        (u32le_bytes(val_len), jnp.where(many, 4, 0)),
        (val_buf, jnp.where(many, val_len, 0)),
        (raw1, jnp.where(one, 8, 0)),
        (p["data"], p["data_len"]),
    ]
    total = HDR + 4 + 4 + pos_buf.shape[1] + 4 + val_buf.shape[1] + 8 + L
    return rowwise_concat(segs, total)


@functools.partial(jax.jit, static_argnames=("L", "emax"))
def depress_exzd_batch(stream, n, L: int, emax: int = None):
    """Batched hasgam_vbsse21_zdq decode -> [B, L] int16."""
    B, M = stream.shape
    emax = emax or L
    e4 = -(-emax // 4) * 4
    zero = jnp.zeros((B,), jnp.int32)
    q = jnp.take_along_axis(
        stream, jnp.full((B, 1), 9, jnp.int32), axis=1
    )[:, 0].astype(jnp.int32)
    zd0 = read_u16le(stream, zero + 10)
    nex = read_u32le(stream, zero + HDR).astype(jnp.int32)
    many = nex > 1
    one = nex == 1
    off = zero + HDR + 4
    pos_len = read_u32le(stream, off).astype(jnp.int32)
    pos_blob = rowwise_shift_left(stream, off + 4, 4 + 5 * e4)
    pos_delta = svb32_decode_batch(pos_blob, nex, e4)[:, :emax].astype(jnp.int32)
    ex_pos_many = jnp.cumsum(pos_delta + 1, axis=1) - 1
    off_after_pos = jnp.where(many, off + 4 + pos_len, off)
    val_len = read_u32le(stream, off_after_pos).astype(jnp.int32)
    val_blob = rowwise_shift_left(stream, off_after_pos + 4, 4 + 5 * e4)
    ex_val_many = svb32_decode_batch(val_blob, nex, e4)[:, :emax].astype(jnp.int32)
    pos1 = read_u32le(stream, off).astype(jnp.int32)
    val1 = read_u32le(stream, off + 4).astype(jnp.int32)
    ex_pos = jnp.where(many[:, None], ex_pos_many, pos1[:, None])
    ex_val = jnp.where(many[:, None], ex_val_many, val1[:, None])
    end_off = jnp.where(
        many, off_after_pos + 4 + val_len, jnp.where(one, off + 8, off)
    )
    eidx = jnp.arange(emax, dtype=jnp.int32)[None, :]
    ex_valid = eidx < nex[:, None]
    tgt = jnp.where(ex_valid, jnp.clip(ex_pos, 0, L - 1), 0)
    ex_grid, ex_mask = monotone_place(ex_val + 256, ex_valid, tgt, L)
    parsed = {"ex_grid": ex_grid, "ex_mask": ex_mask, "nex": nex,
              "end_off": end_off}
    data = rowwise_shift_left(stream, end_off, L)
    vals = vbbe21_fill_batch(parsed, data, n - 1, L)
    # merge zd0 + vals, invert zigzag-delta, then undo the qts shift
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    zd = jnp.concatenate([zd0[:, None].astype(jnp.int32), vals[:, :L - 1]],
                         axis=1)
    zd = jnp.where(pos < n[:, None], zd, 0)
    z = zd & 0xFFFF
    d = (z >> 1) ^ (0x10000 - (z & 1)) & 0xFFFF
    d = d & 0xFFFF
    s = jnp.cumsum(d, axis=1) & 0xFFFF
    out = (s << q[:, None]) & 0xFFFF  # qts_unshift in u16 wrap space
    out = out - ((out & 0x8000) << 1)
    return jnp.where(pos < n[:, None], out, 0).astype(jnp.int16)
