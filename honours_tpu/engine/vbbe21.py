"""Batched vbbe21 exception container in JAX.

TPU formulation of the reference's serial exception scan
(press/press.c:2780-2888): boolean exception mask -> prefix-sum ranks ->
compaction scatters for positions / values / residual bytes; the two
minbits bitpacks ride the shared MSB bit-scatter engine.  Streams are
byte-exact with honours_tpu.codecs.vb.vbbe21_press.
"""

from __future__ import annotations

import jax.numpy as jnp

from honours_tpu.engine.bits import (
    gather_bits_msb,
    read_u16le,
    read_u32le,
    rowwise_concat,
    scatter_bits_msb,
    u16le_bytes,
    u32le_bytes,
)


def bitlen(x: jnp.ndarray) -> jnp.ndarray:
    """ceil(log2(x+1)) elementwise (uint_get_minbits, press/press.c:461)."""
    x = x.astype(jnp.uint32)
    b = jnp.zeros(x.shape, jnp.int32)
    for k in range(32):
        b = b + (x >= jnp.uint32(1) << jnp.uint32(k)).astype(jnp.int32)
    return b


def _compact(values, mask, width, fill=0):
    """Row-compact `values` where mask, into [B, width] (rank scatter)."""
    B, L = values.shape
    ranks = jnp.cumsum(mask.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(mask, ranks, width)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    out = jnp.full((B, width + 1), fill, dtype=values.dtype)
    out = out.at[rows, tgt].set(values, mode="drop")
    return out[:, :width]


def _uint_pack(values, count, nbytes_cap: int):
    """uint_press framing: [minbits:1B][MSB-first packed fields].

    values [B, E] u32 (positions beyond count are ignored), count [B].
    Returns (buf [B, 1 + nbytes_cap], len [B]).
    """
    B, E = values.shape
    pos = jnp.arange(E, dtype=jnp.int32)[None, :]
    valid = pos < count[:, None]
    v = jnp.where(valid, values, 0)
    b = bitlen(v.max(axis=1))[:, None]  # [B,1]
    offs = pos * b
    n_words = (nbytes_cap + 3) // 4
    packed = scatter_bits_msb(v, b, offs, valid, n_words)[:, :nbytes_cap]
    header = b.astype(jnp.uint8)  # [B,1]
    buf = jnp.concatenate([header, packed], axis=1)
    nbits = count * b[:, 0]
    return buf, 1 + (nbits + 7) // 8


def vbbe21_parts_batch(v: jnp.ndarray, n: jnp.ndarray, emax: int = None):
    """Split [B, L] uint16-valued int32 (first n valid) into vbbe21 parts.

    Returns dict with the exception-block segments (byte-exact framing)
    and the residual data bytes; callers append their entropy stage over
    `data` and concatenate.
    """
    B, L = v.shape
    emax = emax or L
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    ex = (v > 255) & valid
    nex = ex.sum(axis=1).astype(jnp.int32)

    ex_pos = _compact(jnp.broadcast_to(pos, v.shape), ex, emax)
    ex_val = _compact(jnp.where(ex, v - 256, 0), ex, emax)
    # delta_increasing: out[0]=pos[0], out[i]=pos[i]-pos[i-1]-1
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), ex_pos[:, :-1]], axis=1)
    pos_delta = (ex_pos - prev - 1).astype(jnp.uint32)

    pos_buf, pos_len = _uint_pack(pos_delta, nex, 4 * emax)
    val_buf, val_len = _uint_pack(ex_val.astype(jnp.uint32), nex, 2 * emax)

    data = _compact(jnp.where(valid & ~ex, v & 0xFF, 0).astype(jnp.uint8),
                    valid & ~ex, L)
    data_len = n - nex

    many = nex > 1
    one = nex == 1
    seg_nex = (u32le_bytes(nex), jnp.full((B,), 4, jnp.int32))
    seg_poslen = (u32le_bytes(pos_len), jnp.where(many, 4, 0))
    seg_pos = (pos_buf, jnp.where(many, pos_len, 0))
    seg_vallen = (u32le_bytes(val_len), jnp.where(many, 4, 0))
    seg_val = (val_buf, jnp.where(many, val_len, 0))
    raw1 = jnp.concatenate(
        [u32le_bytes(ex_pos[:, 0]), u16le_bytes(ex_val[:, 0])], axis=1
    )
    seg_one = (raw1, jnp.where(one, 6, 0))
    exsegs = [seg_nex, seg_poslen, seg_pos, seg_vallen, seg_val, seg_one]
    exlen = sum(s[1] for s in exsegs)
    return {
        "exsegs": exsegs,
        "exlen": exlen,
        "data": data,
        "data_len": data_len,
        "nex": nex,
    }


def vbbe21_encode_batch(v, n, emax: int = None):
    """Full vbbe21 payload (exception block ++ raw residual bytes)."""
    p = vbbe21_parts_batch(v, n, emax)
    L = v.shape[1]
    segs = p["exsegs"] + [(p["data"], p["data_len"])]
    total = 4 + 4 + 4 * (emax or L) + 4 + 2 * (emax or L) + 6 + L + 16
    return rowwise_concat(segs, total)


def vbbe21_decode_batch(stream, base_off, n, data, L: int):
    """Reconstruct [B, L] uint16-valued int32 from the exception block at
    `base_off` in `stream` plus already-entropy-decoded residual `data`
    [B, L] (first n-nex bytes valid).  Returns values [B, L]."""
    B, M = stream.shape
    nex = read_u32le(stream, base_off).astype(jnp.int32)
    many = nex > 1
    one = nex == 1
    off = base_off + 4

    pos_len = read_u32le(stream, off).astype(jnp.int32)
    pos_b_off = off + 4
    pos_bits_b = jnp.take_along_axis(
        stream, jnp.clip(pos_b_off[:, None], 0, M - 1), axis=1
    )[:, 0].astype(jnp.int32)
    # positions: unpack nex fields of pos_bits each, starting after 1B header
    emax = L
    idx = jnp.arange(emax, dtype=jnp.int32)[None, :]
    ex_valid = idx < nex[:, None]
    pos_bit_off = ((pos_b_off[:, None] + 1) << 3) + idx * pos_bits_b[:, None]
    pos_delta = gather_bits_msb(stream, pos_bit_off, pos_bits_b[:, None])
    pos_delta = jnp.where(ex_valid, pos_delta, 0)
    ex_pos_many = jnp.cumsum(pos_delta.astype(jnp.int32) + 1, axis=1) - 1

    off_after_pos = jnp.where(many, off + 4 + pos_len, off)
    val_len = read_u32le(stream, off_after_pos).astype(jnp.int32)
    val_b_off = off_after_pos + 4
    val_bits_b = jnp.take_along_axis(
        stream, jnp.clip(val_b_off[:, None], 0, M - 1), axis=1
    )[:, 0].astype(jnp.int32)
    val_bit_off = ((val_b_off[:, None] + 1) << 3) + idx * val_bits_b[:, None]
    ex_val_many = gather_bits_msb(stream, val_bit_off, val_bits_b[:, None])

    # nex == 1 raw framing
    pos1 = read_u32le(stream, off).astype(jnp.int32)
    val1 = read_u16le(stream, off + 4)

    ex_pos = jnp.where(many[:, None], ex_pos_many, pos1[:, None])
    ex_val = jnp.where(many[:, None], ex_val_many, val1[:, None]).astype(jnp.int32)
    end_off = jnp.where(
        many,
        off_after_pos + 4 + val_len,
        jnp.where(one, off + 6, off),
    )

    # rebuild values: scatter exceptions, fill rest from data via ranks
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    ex_mask = jnp.zeros((B, L + 1), dtype=jnp.int32)
    tgt = jnp.where(ex_valid, jnp.clip(ex_pos, 0, L), L)
    ex_mask = ex_mask.at[rows, tgt].set(1, mode="drop")[:, :L].astype(bool)
    ex_value_grid = jnp.zeros((B, L + 1), dtype=jnp.int32)
    ex_value_grid = ex_value_grid.at[rows, tgt].set(
        ex_val + 256, mode="drop"
    )[:, :L]
    nonex_rank = jnp.cumsum((~ex_mask).astype(jnp.int32), axis=1) - 1
    data_vals = jnp.take_along_axis(
        data.astype(jnp.int32), jnp.clip(nonex_rank, 0, L - 1), axis=1
    )
    pos_l = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos_l < n[:, None]
    v = jnp.where(ex_mask, ex_value_grid, data_vals)
    return jnp.where(valid, v, 0), end_off, nex
