"""Variable-byte exception containers: vb1e2, vbe21, vbbe21, vbsbe21, vbsse21.

The thesis's main container contribution: one byte per value, with values
> 255 escaped to an exception list (mask -> prefix-sum compaction; the
TPU engines express the same scans with cumsum + gather/scatter).

Wire formats (reference: press/press.c:2575-3360):
  vb1e2   [nex:u32][ex_pos:u32 x nex][data: 1B, exceptions inline 2B LE]
  vbe21   [nex:u32][ex_pos:u32 x nex][ex:2B x nex][1B data, ex omitted]
  vbbe21  [nex:u32] ; nex>1: [len:u32][pos deltas-1 | minbits pack]
          [len:u32][ex-256 | minbits pack] ; nex==1: [pos:u32][ex-256:u16]
          ; then 1B data (block comment press/press.c:2767-2773)
  vbsbe21 like vbbe21 but positions svb32-coded (press/press.c:2972-2978)
  vbsse21 like vbsbe21 but values svb16-coded (press/press.c:3178-3184)

`*_zd` variants prepend the zigzag of the first sample as u16 and apply
the container to the remaining nin-1 zigzag-deltas
(press/press.c:3362-3580).

The exception-block byte length parser (`exlen`) mirrors
press/press.c:5100-5110 and is shared with the entropy-layer codecs that
keep the exception block uncompressed.
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.uintc import (
    uint_depress_u16,
    uint_depress_u32,
    uint_press_u16,
    uint_press_u32,
)
from honours_tpu.kernels.svb import (
    svb16_decode,
    svb16_encode,
    svb32_decode,
    svb32_encode,
)
from honours_tpu.transforms.core import (
    delta_increasing_u32,
    undelta_increasing_u32,
    unzigdelta,
    zigdelta,
)

# --------------------------------------------------------------------------
# payload encoders over uint16 value arrays
# --------------------------------------------------------------------------


def _split_exceptions(v: np.ndarray):
    v = np.asarray(v, dtype=np.uint16)
    mask = v > 0xFF
    ex_pos = np.nonzero(mask)[0].astype(np.uint32)
    return mask, ex_pos


def vb1e2_press(v: np.ndarray) -> bytes:
    v = np.asarray(v, dtype=np.uint16)
    mask, ex_pos = _split_exceptions(v)
    nbytes = mask.astype(np.int64) + 1
    ends = np.cumsum(nbytes)
    offs = ends - nbytes
    data = np.zeros(int(ends[-1]) if ends.size else 0, dtype=np.uint8)
    data[offs] = (v & 0xFF).astype(np.uint8)
    data[offs[mask] + 1] = (v[mask] >> 8).astype(np.uint8)
    return (
        struct.pack("<I", ex_pos.size)
        + ex_pos.astype("<u4").tobytes()
        + data.tobytes()
    )


def vb1e2_depress(stream: bytes, n: int) -> np.ndarray:
    (nex,) = struct.unpack_from("<I", stream, 0)
    off = 4
    ex_pos = np.frombuffer(stream, dtype="<u4", count=nex, offset=off).astype(np.int64)
    off += 4 * nex
    data = np.frombuffer(stream, dtype=np.uint8, offset=off)
    mask = np.zeros(n, dtype=bool)
    mask[ex_pos] = True
    nbytes = mask.astype(np.int64) + 1
    offs = np.cumsum(nbytes) - nbytes
    v = data[offs].astype(np.uint16)
    v[mask] |= data[offs[mask] + 1].astype(np.uint16) << 8
    return v


def vbe21_press(v: np.ndarray) -> bytes:
    v = np.asarray(v, dtype=np.uint16)
    mask, ex_pos = _split_exceptions(v)
    return (
        struct.pack("<I", ex_pos.size)
        + ex_pos.astype("<u4").tobytes()
        + v[mask].astype("<u2").tobytes()
        + (v[~mask] & 0xFF).astype(np.uint8).tobytes()
    )


def vbe21_depress(stream: bytes, n: int) -> np.ndarray:
    (nex,) = struct.unpack_from("<I", stream, 0)
    off = 4
    ex_pos = np.frombuffer(stream, dtype="<u4", count=nex, offset=off).astype(np.int64)
    off += 4 * nex
    ex = np.frombuffer(stream, dtype="<u2", count=nex, offset=off)
    off += 2 * nex
    out = np.empty(n, dtype=np.uint16)
    mask = np.zeros(n, dtype=bool)
    mask[ex_pos] = True
    data = np.frombuffer(stream, dtype=np.uint8, offset=off, count=n - nex)
    out[mask] = ex
    out[~mask] = data
    return out


def _bitpacked_ex_block(ex_pos: np.ndarray, ex_vals: np.ndarray, pos_svb: bool,
                        val_svb: bool) -> bytes:
    """nex>1 exception block shared by vbbe21/vbsbe21/vbsse21."""
    pos_d = delta_increasing_u32(ex_pos)
    pos_blob = svb32_encode(pos_d) if pos_svb else uint_press_u32(pos_d)
    val_blob = svb16_encode(ex_vals) if val_svb else uint_press_u16(ex_vals)
    return (
        struct.pack("<I", len(pos_blob))
        + pos_blob
        + struct.pack("<I", len(val_blob))
        + val_blob
    )


def _vbb_press(v: np.ndarray, pos_svb: bool, val_svb: bool) -> bytes:
    v = np.asarray(v, dtype=np.uint16)
    mask, ex_pos = _split_exceptions(v)
    nex = ex_pos.size
    ex_vals = (v[mask] - np.uint16(0x100)).astype(np.uint16)
    out = [struct.pack("<I", nex)]
    if nex > 1:
        out.append(_bitpacked_ex_block(ex_pos, ex_vals, pos_svb, val_svb))
    elif nex == 1:
        out.append(ex_pos.astype("<u4").tobytes())
        out.append(ex_vals.astype("<u2").tobytes())
    out.append((v[~mask] & 0xFF).astype(np.uint8).tobytes())
    return b"".join(out)


def _vbb_depress(stream: bytes, n: int, pos_svb: bool, val_svb: bool) -> np.ndarray:
    (nex,) = struct.unpack_from("<I", stream, 0)
    off = 4
    if nex > 1:
        (pos_len,) = struct.unpack_from("<I", stream, off)
        off += 4
        pos_blob = stream[off : off + pos_len]
        off += pos_len
        if pos_svb:
            pos_d, _ = svb32_decode(pos_blob, nex)
        else:
            pos_d = uint_depress_u32(pos_blob, nex)
        ex_pos = undelta_increasing_u32(pos_d).astype(np.int64)
        (val_len,) = struct.unpack_from("<I", stream, off)
        off += 4
        val_blob = stream[off : off + val_len]
        off += val_len
        if val_svb:
            ex_vals, _ = svb16_decode(val_blob, nex)
        else:
            ex_vals = uint_depress_u16(val_blob, nex)
    elif nex == 1:
        ex_pos = np.frombuffer(stream, dtype="<u4", count=1, offset=off).astype(
            np.int64
        )
        off += 4
        ex_vals = np.frombuffer(stream, dtype="<u2", count=1, offset=off)
        off += 2
    else:
        ex_pos = np.zeros(0, dtype=np.int64)
        ex_vals = np.zeros(0, dtype=np.uint16)
    out = np.empty(n, dtype=np.uint16)
    mask = np.zeros(n, dtype=bool)
    mask[ex_pos] = True
    data = np.frombuffer(stream, dtype=np.uint8, offset=off, count=n - nex)
    out[mask] = (ex_vals + np.uint16(0x100)).astype(np.uint16)
    out[~mask] = data
    return out


def vbbe21_press(v):
    return _vbb_press(v, pos_svb=False, val_svb=False)


def vbbe21_depress(stream, n):
    return _vbb_depress(stream, n, pos_svb=False, val_svb=False)


def vbsbe21_press(v):
    return _vbb_press(v, pos_svb=True, val_svb=False)


def vbsbe21_depress(stream, n):
    return _vbb_depress(stream, n, pos_svb=True, val_svb=False)


def vbsse21_press(v):
    return _vbb_press(v, pos_svb=True, val_svb=True)


def vbsse21_depress(stream, n):
    return _vbb_depress(stream, n, pos_svb=True, val_svb=True)


def exblock_len(stream: bytes, offset: int, kind: str) -> int:
    """Byte length of [nex][exception blocks] starting at `offset`.

    Mirrors the exlen computation the entropy layers use to keep the
    exception block uncompressed (press/press.c:5100-5110 for the
    bitpacked variants, press/press.c:3992-3994 for vbe21).
    """
    (nex,) = struct.unpack_from("<I", stream, offset)
    if kind == "vbe21":
        return 4 + nex * 6
    exlen = 4
    if nex > 1:
        (pos_len,) = struct.unpack_from("<I", stream, offset + exlen)
        exlen += 4 + pos_len
        (val_len,) = struct.unpack_from("<I", stream, offset + exlen)
        exlen += 4 + val_len
    elif nex == 1:
        exlen += 6
    return exlen


PAYLOAD = {
    "vb1e2": (vb1e2_press, vb1e2_depress),
    "vbe21": (vbe21_press, vbe21_depress),
    "vbbe21": (vbbe21_press, vbbe21_depress),
    "vbsbe21": (vbsbe21_press, vbsbe21_depress),
    "vbsse21": (vbsse21_press, vbsse21_depress),
}


# --------------------------------------------------------------------------
# codecs
# --------------------------------------------------------------------------


def vb_bound(nin: int) -> int:
    """Loose bound mirroring vb1e2_bound (press/press.c:2575-2583)."""
    return int(1 + nin * 0.2 * 6 + nin * 0.8) + 64


class VbCodec(Codec):
    """Container applied directly to uint16 samples (no transform)."""

    def __init__(self, kind: str):
        self.kind = kind
        self.name = kind
        self._press, self._depress = PAYLOAD[kind]

    def bound(self, nin: int) -> int:
        return vb_bound(nin)

    def press(self, signal):
        return self._press(np.asarray(signal, dtype=np.int16).view(np.uint16))

    def depress(self, stream, nin):
        return self._depress(stream, nin).view(np.int16).copy()


class VbZdCodec(Codec):
    """[zigzag(first sample):u16][container over zd[1:]]"""

    def __init__(self, kind: str):
        self.kind = kind
        self.name = f"{kind}_zd"
        self._press, self._depress = PAYLOAD[kind]

    def bound(self, nin: int) -> int:
        return 2 + vb_bound(nin - 1)

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        return zd[:1].astype("<u2").tobytes() + self._press(zd[1:])

    def depress(self, stream, nin):
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1)[0]
        zd[1:] = self._depress(stream[2:], nin - 1)
        return unzigdelta(zd)


for _kind in PAYLOAD:
    register(VbCodec(_kind))
    register(VbZdCodec(_kind))
