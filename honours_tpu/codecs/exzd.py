"""ex-zd: the production slow5lib codec variant ("hasgam_vbsse21_zdq").

Stream format (reference: press/ex_zd.c:403-457 ptr_compress_ex_zd_v0):
  [version:1B = 0][nin:u64 LE][q:1B]
  [zd[0]:u16]
  [nex:u32] ; nex>1: [len:u32][svb32 of pos deltas-1][len:u32][svb32 of
  (v-256) as u32] ; nex==1: [pos:u32][val-256:u32]
  [1B data]
where q = quantisation trailing-zero shift (press/ex_zd.c:358-401) applied
to the int16 samples before zigzag-delta.
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.generic import OuterLayerCodec
from honours_tpu.kernels.svb import svb32_decode, svb32_encode
from honours_tpu.transforms.core import (
    delta_increasing_u32,
    find_qts,
    qts_shift,
    qts_unshift,
    undelta_increasing_u32,
    unzigdelta,
    zigdelta,
)


def ex_press_u16(v: np.ndarray) -> bytes:
    """Exception block + data over uint16 values (press/ex_zd.c:9-172).
    Exceptions stored as uint32 (unlike vbsse21's uint16/svb16)."""
    v = np.asarray(v, dtype=np.uint16)
    mask = v > 0xFF
    ex_pos = np.nonzero(mask)[0].astype(np.uint32)
    nex = ex_pos.size
    ex_vals = (v[mask].astype(np.uint32) - 0x100).astype(np.uint32)
    out = [struct.pack("<I", nex)]
    if nex > 1:
        pos_blob = svb32_encode(delta_increasing_u32(ex_pos))
        val_blob = svb32_encode(ex_vals)
        out += [
            struct.pack("<I", len(pos_blob)),
            pos_blob,
            struct.pack("<I", len(val_blob)),
            val_blob,
        ]
    elif nex == 1:
        out += [ex_pos.astype("<u4").tobytes(), ex_vals.astype("<u4").tobytes()]
    out.append((v[~mask] & 0xFF).astype(np.uint8).tobytes())
    return b"".join(out)


def ex_depress_u16(stream: bytes, n: int) -> np.ndarray:
    (nex,) = struct.unpack_from("<I", stream, 0)
    off = 4
    if nex > 1:
        (pos_len,) = struct.unpack_from("<I", stream, off)
        off += 4
        pos_d, _ = svb32_decode(stream[off : off + pos_len], nex)
        off += pos_len
        ex_pos = undelta_increasing_u32(pos_d).astype(np.int64)
        (val_len,) = struct.unpack_from("<I", stream, off)
        off += 4
        ex_vals, _ = svb32_decode(stream[off : off + val_len], nex)
        off += val_len
    elif nex == 1:
        ex_pos = np.frombuffer(stream, dtype="<u4", count=1, offset=off).astype(
            np.int64
        )
        off += 4
        ex_vals = np.frombuffer(stream, dtype="<u4", count=1, offset=off)
        off += 4
    else:
        ex_pos = np.zeros(0, dtype=np.int64)
        ex_vals = np.zeros(0, dtype=np.uint32)
    out = np.empty(n, dtype=np.uint16)
    mask = np.zeros(n, dtype=bool)
    mask[ex_pos] = True
    out[mask] = (ex_vals + 0x100).astype(np.uint16)
    out[~mask] = np.frombuffer(stream, dtype=np.uint8, offset=off, count=n - nex)
    return out


class ExZdCodec(Codec):
    name = "hasgam_vbsse21_zdq"

    def bound(self, nin: int) -> int:
        return nin * 2 + 1024

    def press(self, signal):
        x = np.asarray(signal, dtype=np.int16)
        q = find_qts(x, 5) if x.size else 0
        xq = qts_shift(x, q) if q else x
        zd = zigdelta(xq)
        return (
            b"\x00"
            + struct.pack("<Q", x.size)
            + bytes([q])
            + zd[:1].astype("<u2").tobytes()
            + ex_press_u16(zd[1:])
        )

    def depress(self, stream, nin):
        ver = stream[0]
        if ver != 0:
            raise ValueError(f"unsupported ex-zd version {ver}")
        (n,) = struct.unpack_from("<Q", stream, 1)
        assert n == nin
        q = stream[9]
        body = stream[10:]
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(body, dtype="<u2", count=1)[0]
        zd[1:] = ex_depress_u16(body[2:], nin - 1)
        x = unzigdelta(zd)
        return qts_unshift(x, q) if q else x


_exzd = register(ExZdCodec())
register(
    OuterLayerCodec("zlib", _exzd, with_nin=False, name="zlib_hasgam_vbsse21_zdq")
)
register(
    OuterLayerCodec("zstd", _exzd, with_nin=False, name="zstd_hasgam_vbsse21_zdq")
)
