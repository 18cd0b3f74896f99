"""Batched vbbe21 exception container in JAX — gather/scatter-free.

TPU formulation of the reference's serial exception scan
(press/press.c:2780-2888): the boolean exception mask drives monotone
compactions (O(log N) shift walks, engine/permute.py) instead of XLA
scatter; the two minbits bitpacks ride the segmented-OR pack engine
(engine/bits.pack_fields_msb) and decode reads fields via the
compact+expand+forward-fill unpacker.  Streams are byte-exact with
honours_tpu.codecs.vb.vbbe21_press.
"""

from __future__ import annotations

import jax.numpy as jnp

from honours_tpu.engine.bits import (
    monotone_place,
    pack_fields_msb,
    read_u16le,
    read_u32le,
    rowwise_concat,
    u16le_bytes,
    u32le_bytes,
    unpack_fields_msb,
)
from honours_tpu.engine.permute import (
    forward_fill,
    monotone_compact,
    monotone_expand,
)


def bitlen(x: jnp.ndarray) -> jnp.ndarray:
    """ceil(log2(x+1)) elementwise (uint_get_minbits, press/press.c:461)."""
    x = x.astype(jnp.uint32)
    b = jnp.zeros(x.shape, jnp.int32)
    for k in range(32):
        b = b + (x >= jnp.uint32(1) << jnp.uint32(k)).astype(jnp.int32)
    return b


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
    packed = pack_fields_msb(v, b, offs, valid, n_words)[:, :nbytes_cap]
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

    if L <= (1 << 16):
        # pos (<=16 bits) and val-256 (<=16 bits) ride ONE compaction
        # packed in a u32 word instead of two full-width walks
        comb = jnp.where(ex, (pos | ((v - 256) << 16)), 0)
        comb_full, _ = monotone_compact(comb, ex)
        ex_pos = comb_full[:, :emax] & 0xFFFF
        ex_val = (comb_full[:, :emax] >> 16) & 0xFFFF
    else:
        ex_pos_full, _ = monotone_compact(jnp.broadcast_to(pos, v.shape), ex)
        ex_val_full, _ = monotone_compact(jnp.where(ex, v - 256, 0), ex)
        ex_pos = ex_pos_full[:, :emax]
        ex_val = ex_val_full[:, :emax]
    # delta_increasing: out[0]=pos[0], out[i]=pos[i]-pos[i-1]-1
    prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), ex_pos[:, :-1]], axis=1)
    pos_delta = (ex_pos - prev - 1).astype(jnp.uint32)

    pos_buf, pos_len = _uint_pack(pos_delta, nex, 4 * emax)
    val_buf, val_len = _uint_pack(ex_val.astype(jnp.uint32), nex, 2 * emax)

    data, _ = monotone_compact(
        jnp.where(valid & ~ex, v & 0xFF, 0).astype(jnp.uint8), valid & ~ex
    )
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


def vbbe21_parse_batch(stream, base_off, n, L: int, emax: int = None):
    """Parse the vbbe21 exception block at `base_off` (no residual data
    needed).  Returns dict(ex_grid, ex_mask, nex, end_off): the exception
    values already placed on the [B, L] grid, the block end offset (where
    the entropy body starts), and the exception counts.

    `emax` statically caps the exception count the vectorized unpack is
    sized for (buffers scale with it); rows with nex > emax decode
    incorrectly — callers that cap must verify nex (or round-trip).
    """
    B, M = stream.shape
    emax = emax or L
    nex = read_u32le(stream, base_off).astype(jnp.int32)
    many = nex > 1
    one = nex == 1
    off = base_off + 4

    pos_len = read_u32le(stream, off).astype(jnp.int32)
    pos_b_off = off + 4
    pos_bits_b = jnp.take_along_axis(
        stream, jnp.clip(pos_b_off[:, None], 0, M - 1), axis=1
    )[:, 0].astype(jnp.int32)
    # positions: unpack nex fields of pos_bits each, after the 1B header
    pos_delta = unpack_fields_msb(stream, pos_b_off + 1, pos_bits_b, nex, emax)
    ex_pos_many = jnp.cumsum(pos_delta.astype(jnp.int32) + 1, axis=1) - 1

    off_after_pos = jnp.where(many, off + 4 + pos_len, off)
    val_len = read_u32le(stream, off_after_pos).astype(jnp.int32)
    val_b_off = off_after_pos + 4
    val_bits_b = jnp.take_along_axis(
        stream, jnp.clip(val_b_off[:, None], 0, M - 1), axis=1
    )[:, 0].astype(jnp.int32)
    ex_val_many = unpack_fields_msb(stream, val_b_off + 1, val_bits_b, nex, emax)

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

    # place exceptions at their positions (strictly increasing ->
    # compact+expand)
    eidx = jnp.arange(emax, dtype=jnp.int32)[None, :]
    ex_valid = eidx < nex[:, None]
    tgt = jnp.where(ex_valid, jnp.clip(ex_pos, 0, L - 1), 0)
    ex_grid, ex_mask = monotone_place(ex_val + 256, ex_valid, tgt, L)
    return {"ex_grid": ex_grid, "ex_mask": ex_mask, "nex": nex,
            "end_off": end_off}


def vbbe21_fill_batch(parsed, data, n, L: int):
    """Merge entropy-decoded residual bytes `data` [B, >=L] (first n-nex
    valid) with a parsed exception block -> values [B, L]."""
    ex_grid, ex_mask = parsed["ex_grid"], parsed["ex_mask"]
    idx = jnp.arange(L, dtype=jnp.int32)[None, :]
    # expand data bytes onto the non-exception positions
    nonex = (~ex_mask) & (idx < n[:, None])
    rank = jnp.cumsum(nonex.astype(jnp.int32), axis=1) - nonex.astype(jnp.int32)
    shift_g = jnp.where(nonex, idx - rank, 0)
    shift, cnt = monotone_compact(shift_g, nonex)
    validc = idx < cnt[:, None]
    # u8 expand routes to the Pallas walk on TPU (see svb16.py note)
    data_grid, _ = monotone_expand(
        data[:, :L].astype(jnp.uint8), jnp.where(validc, shift, 0), validc, L
    )
    data_grid = data_grid.astype(jnp.int32)
    valid = idx < n[:, None]
    v = jnp.where(ex_mask, ex_grid, data_grid)
    return jnp.where(valid, v, 0)


def vbbe21_decode_batch(stream, base_off, n, data, L: int, emax: int = None):
    """Parse + fill in one call (see vbbe21_parse_batch for caveats).
    Returns (values [B, L], end_off [B], nex [B])."""
    parsed = vbbe21_parse_batch(stream, base_off, n, L, emax)
    vals = vbbe21_fill_batch(parsed, data, n, L)
    return vals, parsed["end_off"], parsed["nex"]
