"""Batched vb exception containers: vb1e2, vbe21, vbsbe21, vbsse21.

Completes the TPU engine coverage of the reference's exception family
(press/press.c:2575-3360; vbbe21 lives in engine/vbbe21.py).  All four
share the same machinery: the exception mask drives monotone compactions
for positions/values/residual bytes, u32/u16 grids serialize raw
position/value lists, and the svb-coded variants ride the batched
svb32/svb16 engines.  Decode parsers produce the same
{ex_grid, ex_mask, nex, end_off} dict as vbbe21_parse_batch so
vbbe21_fill_batch merges residual bytes for every container.

Streams are byte-exact with honours_tpu.codecs.vb.PAYLOAD; the *_zd
pipelines ([zd0:u16][container over zd[1:]], press/press.c:3367-3580)
are exposed via press_vb_zd_batch / depress_vb_zd_batch.
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
from honours_tpu.engine.permute import (
    compaction_shifts,
    monotone_compact,
    monotone_expand,
    rowwise_shift_left,
)
from honours_tpu.engine.svb16 import _interleave2, svb16_decode_batch
from honours_tpu.engine.svb32 import svb32_decode_batch, svb32_encode_batch
from honours_tpu.engine.vbbe21 import _uint_pack, vbbe21_fill_batch
from honours_tpu.transforms.core import jnp_unzigdelta, jnp_zigdelta


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _ex_parts(v, n, emax: int):
    """Shared exception scan: mask, compacted positions/values, counts."""
    B, L = v.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    ex = (v > 255) & valid
    nex = ex.sum(axis=1).astype(jnp.int32)
    ex_pos = monotone_compact(jnp.broadcast_to(pos, v.shape), ex)[0][:, :emax]
    ex_val = monotone_compact(jnp.where(ex, v, 0), ex)[0][:, :emax]
    data, _ = monotone_compact(
        jnp.where(valid & ~ex, v & 0xFF, 0).astype(jnp.uint8), valid & ~ex
    )
    return dict(valid=valid, ex=ex, nex=nex, ex_pos=ex_pos, ex_val=ex_val,
                data=data, data_len=n - nex)


def _u32_grid_bytes(x):
    """[B, E] -> [B, 4E] u8 LE."""
    B, E = x.shape
    sh = jnp.array([0, 8, 16, 24], jnp.uint32).reshape(1, 1, 4)
    return (
        ((x.astype(jnp.uint32)[:, :, None] >> sh) & jnp.uint32(0xFF))
        .astype(jnp.uint8).reshape(B, 4 * E)
    )


def _u16_grid_bytes(x):
    B, E = x.shape
    sh = jnp.array([0, 8], jnp.uint32).reshape(1, 1, 2)
    return (
        ((x.astype(jnp.uint32)[:, :, None] >> sh) & jnp.uint32(0xFF))
        .astype(jnp.uint8).reshape(B, 2 * E)
    )


def _u32_grid_read(stream, off, E: int):
    """Per-row u32 list at byte offset off -> [B, E] i32."""
    B, M = stream.shape
    buf = rowwise_shift_left(stream, off, 4 * E).astype(jnp.int32)
    b = buf.reshape(B, E, 4)
    return b[:, :, 0] | (b[:, :, 1] << 8) | (b[:, :, 2] << 16) | (b[:, :, 3] << 24)


def _u16_grid_read(stream, off, E: int):
    B, M = stream.shape
    buf = rowwise_shift_left(stream, off, 2 * E).astype(jnp.int32)
    b = buf.reshape(B, E, 2)
    return b[:, :, 0] | (b[:, :, 1] << 8)


# ---------------------------------------------------------------------------
# vb1e2: [nex:u32][ex_pos u32 x nex][1B data, exceptions inline 2B LE]
# ---------------------------------------------------------------------------


def vb1e2_encode_batch(v, n, emax: int = None):
    B, L = v.shape
    emax = emax or L
    p = _ex_parts(v, n, emax)
    lo = (v & 0xFF).astype(jnp.uint8)
    hi = ((v >> 8) & 0xFF).astype(jnp.uint8)
    keep = _interleave2(p["valid"], p["valid"] & p["ex"])
    data, data_len = monotone_compact(_interleave2(lo, hi), keep)
    segs = [
        (u32le_bytes(p["nex"]), jnp.full((B,), 4, jnp.int32)),
        (_u32_grid_bytes(p["ex_pos"]), 4 * p["nex"]),
        (data, data_len),
    ]
    return rowwise_concat(segs, 4 + 4 * emax + 2 * L)


def vb1e2_decode_batch(stream, base_off, n, L: int, emax: int = None):
    B, M = stream.shape
    emax = emax or L
    nex = read_u32le(stream, base_off).astype(jnp.int32)
    ex_pos = _u32_grid_read(stream, base_off + 4, emax)
    eidx = jnp.arange(emax, dtype=jnp.int32)[None, :]
    ex_valid = eidx < nex[:, None]
    tgt = jnp.where(ex_valid, jnp.clip(ex_pos, 0, L - 1), 0)
    _, ex_mask = monotone_place(jnp.ones_like(tgt), ex_valid, tgt, L)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    data = rowwise_shift_left(stream, base_off + 4 + 4 * nex, 2 * L)
    keep = _interleave2(valid, valid & ex_mask)
    shift, cnt = compaction_shifts(keep)
    rk = jnp.arange(2 * L, dtype=jnp.int32)[None, :]
    validc = rk < cnt[:, None]
    # u8 expand routes to the Pallas walk on TPU (see svb16.py note)
    grid, _ = monotone_expand(data, shift, validc, 2 * L)
    b0 = grid[:, 0::2].astype(jnp.int32)
    b1 = grid[:, 1::2].astype(jnp.int32)
    vv = jnp.where(ex_mask, b0 | (b1 << 8), b0)
    return jnp.where(valid, vv, 0)


# ---------------------------------------------------------------------------
# vbe21: [nex:u32][ex_pos u32 x nex][ex u16 x nex][1B data]
# ---------------------------------------------------------------------------


def vbe21_encode_batch(v, n, emax: int = None):
    B, L = v.shape
    emax = emax or L
    p = _ex_parts(v, n, emax)
    segs = [
        (u32le_bytes(p["nex"]), jnp.full((B,), 4, jnp.int32)),
        (_u32_grid_bytes(p["ex_pos"]), 4 * p["nex"]),
        (_u16_grid_bytes(p["ex_val"]), 2 * p["nex"]),
        (p["data"], p["data_len"]),
    ]
    return rowwise_concat(segs, 4 + 6 * emax + L)


def vbe21_parse_batch(stream, base_off, n, L: int, emax: int = None):
    B, M = stream.shape
    emax = emax or L
    nex = read_u32le(stream, base_off).astype(jnp.int32)
    ex_pos = _u32_grid_read(stream, base_off + 4, emax)
    ex_val = _u16_grid_read(stream, base_off + 4 + 4 * nex, emax)
    eidx = jnp.arange(emax, dtype=jnp.int32)[None, :]
    ex_valid = eidx < nex[:, None]
    tgt = jnp.where(ex_valid, jnp.clip(ex_pos, 0, L - 1), 0)
    ex_grid, ex_mask = monotone_place(ex_val, ex_valid, tgt, L)
    return {"ex_grid": ex_grid, "ex_mask": ex_mask, "nex": nex,
            "end_off": base_off + 4 + 6 * nex}


# ---------------------------------------------------------------------------
# vbsbe21 / vbsse21: vbbe21 framing with svb-coded exception blocks
# (press/press.c:2972-2978, 3178-3184)
# ---------------------------------------------------------------------------


def _svb_exblock_parts(p, emax: int, val_svb: bool):
    """nex>1 block: [poslen:u32][svb32 pos deltas][vallen:u32][val blob]."""
    from honours_tpu.engine.svb16 import svb16_encode_batch

    B = p["nex"].shape[0]
    e4 = -(-emax // 4) * 4
    prev = jnp.concatenate(
        [jnp.full((B, 1), -1, jnp.int32), p["ex_pos"][:, :-1]], axis=1
    )
    pos_delta = jnp.pad(p["ex_pos"] - prev - 1, ((0, 0), (0, e4 - emax)))
    pos_buf, pos_len = svb32_encode_batch(pos_delta.astype(jnp.uint32), p["nex"])
    vals = (p["ex_val"] - 256) & 0xFFFF
    if val_svb:
        e8 = _round8(emax)
        v16 = jnp.pad(vals, ((0, 0), (0, e8 - emax))).astype(jnp.int16)
        val_buf, val_len = svb16_encode_batch(v16, p["nex"], zd=False)
    else:
        val_buf, val_len = _uint_pack(vals.astype(jnp.uint32), p["nex"], 2 * emax)
    many = p["nex"] > 1
    one = p["nex"] == 1
    raw1 = jnp.concatenate(
        [u32le_bytes(p["ex_pos"][:, 0]), u16le_bytes(vals[:, 0])], axis=1
    )
    segs = [
        (u32le_bytes(p["nex"]), jnp.full((B,), 4, jnp.int32)),
        (u32le_bytes(pos_len), jnp.where(many, 4, 0)),
        (pos_buf, jnp.where(many, pos_len, 0)),
        (u32le_bytes(val_len), jnp.where(many, 4, 0)),
        (val_buf, jnp.where(many, val_len, 0)),
        (raw1, jnp.where(one, 6, 0)),
    ]
    width = 4 + 4 + pos_buf.shape[1] + 4 + val_buf.shape[1] + 6
    return segs, width


def vbs_encode_batch(v, n, emax: int = None, val_svb: bool = False):
    """vbsbe21 (val_svb=False) / vbsse21 (val_svb=True) payload."""
    B, L = v.shape
    emax = emax or L
    p = _ex_parts(v, n, emax)
    segs, width = _svb_exblock_parts(p, emax, val_svb)
    segs.append((p["data"], p["data_len"]))
    return rowwise_concat(segs, width + L)


def vbs_parse_batch(stream, base_off, n, L: int, val_svb: bool,
                    emax: int = None):
    B, M = stream.shape
    emax = emax or L
    e4 = -(-emax // 4) * 4
    nex = read_u32le(stream, base_off).astype(jnp.int32)
    many = nex > 1
    one = nex == 1
    off = base_off + 4
    pos_len = read_u32le(stream, off).astype(jnp.int32)
    pos_blob = rowwise_shift_left(stream, off + 4, 4 + 5 * e4)
    pos_delta = svb32_decode_batch(pos_blob, nex, e4)[:, :emax].astype(jnp.int32)
    ex_pos_many = jnp.cumsum(pos_delta + 1, axis=1) - 1
    off_after_pos = jnp.where(many, off + 4 + pos_len, off)
    val_len = read_u32le(stream, off_after_pos).astype(jnp.int32)
    if val_svb:
        e8 = _round8(emax)
        val_blob = rowwise_shift_left(stream, off_after_pos + 4, e8 // 8 + 2 * e8)
        ex_val_many = (
            svb16_decode_batch(val_blob, nex, e8, zd=False)[:, :emax]
            .astype(jnp.int32) & 0xFFFF
        )
    else:
        from honours_tpu.engine.bits import unpack_fields_msb

        val_b_off = off_after_pos + 4
        val_bits_b = jnp.take_along_axis(
            stream, jnp.clip(val_b_off[:, None], 0, M - 1), axis=1
        )[:, 0].astype(jnp.int32)
        ex_val_many = unpack_fields_msb(
            stream, val_b_off + 1, val_bits_b, nex, emax
        ).astype(jnp.int32)
    pos1 = read_u32le(stream, off).astype(jnp.int32)
    val1 = read_u16le(stream, off + 4).astype(jnp.int32)
    ex_pos = jnp.where(many[:, None], ex_pos_many, pos1[:, None])
    ex_val = jnp.where(many[:, None], ex_val_many, val1[:, None])
    end_off = jnp.where(
        many, off_after_pos + 4 + val_len, jnp.where(one, off + 6, off)
    )
    eidx = jnp.arange(emax, dtype=jnp.int32)[None, :]
    ex_valid = eidx < nex[:, None]
    tgt = jnp.where(ex_valid, jnp.clip(ex_pos, 0, L - 1), 0)
    ex_grid, ex_mask = monotone_place(ex_val + 256, ex_valid, tgt, L)
    return {"ex_grid": ex_grid, "ex_mask": ex_mask, "nex": nex,
            "end_off": end_off}


# ---------------------------------------------------------------------------
# *_zd pipelines: [zd0:u16][container over zd[1:]]
# ---------------------------------------------------------------------------

def _vbbe21_encode(v, n, emax=None):
    from honours_tpu.engine.vbbe21 import vbbe21_encode_batch

    return vbbe21_encode_batch(v, n, emax)


_ENCODERS = {
    "vb1e2": vb1e2_encode_batch,
    "vbe21": vbe21_encode_batch,
    "vbbe21": _vbbe21_encode,
    "vbsbe21": functools.partial(vbs_encode_batch, val_svb=False),
    "vbsse21": functools.partial(vbs_encode_batch, val_svb=True),
}


def _encoder_segs(kind: str, v, n, emax: int):
    """(segs, width) of the container payload — lets callers prepend
    their own header segments and pay for ONE concat walk total."""
    B, L = v.shape
    if kind == "vb1e2":
        p = _ex_parts(v, n, emax)
        lo = (v & 0xFF).astype(jnp.uint8)
        hi = ((v >> 8) & 0xFF).astype(jnp.uint8)
        keep = _interleave2(p["valid"], p["valid"] & p["ex"])
        data, data_len = monotone_compact(_interleave2(lo, hi), keep)
        segs = [
            (u32le_bytes(p["nex"]), jnp.full((B,), 4, jnp.int32)),
            (_u32_grid_bytes(p["ex_pos"]), 4 * p["nex"]),
            (data, data_len),
        ]
        return segs, 4 + 4 * emax + 2 * L
    if kind == "vbe21":
        p = _ex_parts(v, n, emax)
        segs = [
            (u32le_bytes(p["nex"]), jnp.full((B,), 4, jnp.int32)),
            (_u32_grid_bytes(p["ex_pos"]), 4 * p["nex"]),
            (_u16_grid_bytes(p["ex_val"]), 2 * p["nex"]),
            (p["data"], p["data_len"]),
        ]
        return segs, 4 + 6 * emax + L
    if kind == "vbbe21":
        from honours_tpu.engine.vbbe21 import vbbe21_parts_batch

        p = vbbe21_parts_batch(v, n, emax)
        segs = p["exsegs"] + [(p["data"], p["data_len"])]
        return segs, 4 + 4 + 4 * emax + 4 + 2 * emax + 16 + L
    p = _ex_parts(v, n, emax)
    segs, width = _svb_exblock_parts(p, emax, val_svb=(kind == "vbsse21"))
    segs.append((p["data"], p["data_len"]))
    return segs, width + L


def _zd_head(sig, n):
    B, L = sig.shape
    zd = jnp_zigdelta(sig)
    rest = jnp.concatenate([zd[:, 1:], jnp.zeros((B, 1), zd.dtype)], axis=1)
    return zd[:, 0], rest


@functools.partial(jax.jit, static_argnames=("kind", "emax"))
def press_vb_zd_batch(sig, n, kind: str, emax: int = None):
    """Batched <kind>_zd encode -> (stream [B, M] u8, len [B]).

    Flattened framing: the zd0 header joins the container's own segment
    list so the whole stream packs in ONE concat walk."""
    B, L = sig.shape
    emax = emax or L
    zd0, rest = _zd_head(sig, n)
    segs, width = _encoder_segs(kind, rest, n - 1, emax)
    segs = [(u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32))] + segs
    return rowwise_concat(segs, 2 + width)


@functools.partial(jax.jit, static_argnames=("kind", "L", "emax"))
def depress_vb_zd_batch(stream, n, kind: str, L: int, emax: int = None):
    """Batched <kind>_zd decode -> [B, L] int16."""
    from honours_tpu.engine.pipeline import _zd_merge

    B, M = stream.shape
    zd0 = read_u16le(stream, jnp.zeros((B,), jnp.int32))
    base = jnp.full((B,), 2, jnp.int32)
    if kind == "vb1e2":
        vals = vb1e2_decode_batch(stream, base, n - 1, L, emax)
    else:
        if kind == "vbe21":
            parsed = vbe21_parse_batch(stream, base, n - 1, L, emax)
        elif kind == "vbbe21":
            from honours_tpu.engine.vbbe21 import vbbe21_parse_batch

            parsed = vbbe21_parse_batch(stream, base, n - 1, L, emax)
        elif kind == "vbsbe21":
            parsed = vbs_parse_batch(stream, base, n - 1, L, False, emax)
        elif kind == "vbsse21":
            parsed = vbs_parse_batch(stream, base, n - 1, L, True, emax)
        else:
            raise KeyError(kind)
        data = rowwise_shift_left(stream, parsed["end_off"], L)
        vals = vbbe21_fill_batch(parsed, data, n - 1, L)
    return _zd_merge(zd0, vals, n, L)


# classic svb over zigzag-deltas (svb_zd / svb0124_zd, no header)
@functools.partial(jax.jit, static_argnames=("variant",))
def press_svb_zd_batch(sig, n, variant: str = "1234"):
    zd = jnp_zigdelta(sig).astype(jnp.uint32)
    return svb32_encode_batch(zd, n, variant)


@functools.partial(jax.jit, static_argnames=("L", "variant"))
def depress_svb_zd_batch(stream, n, L: int, variant: str = "1234"):
    v = svb32_decode_batch(stream, n, L, variant).astype(jnp.int32)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    out = jnp_unzigdelta(jnp.where(pos < n[:, None], v, 0))
    return jnp.where(pos < n[:, None], out, 0).astype(jnp.int16)
