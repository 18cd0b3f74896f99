"""Golomb-Rice coder over bytes + rice_vb*_zd compositions.

Bit stream uses LSB-first bit order within bytes (the bitmap helpers'
BIT_MASK(n) = 1 << (n % 8), press/bitmap.h:15).  Layout
(press/press.c:4893-4924):
  [k as 3 bits: k2,k1,k0][per value: q ones, one zero, k value bits
  MSB-first]  with k in [0,8) minimising total size
  (rice_find_k, press/press.c:4867-4891).

Compositions rice_vb*_zd keep the vb exception block raw and rice-code the
1-byte residual stream (press/press.c:4990-5025); decode needs the
original element count (the reference passes nin - nex - 1).
"""

from __future__ import annotations

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.transforms.core import unzigdelta, zigdelta


def rice_find_k(data: np.ndarray) -> int:
    v = np.asarray(data, dtype=np.int64)
    best_k, best = 0, np.iinfo(np.int64).max
    for k in range(8):
        size = int((v >> k).sum()) + v.size * (1 + k)
        if size < best:
            best, best_k = size, k
    return best_k


def rice_total_bits(data: np.ndarray) -> int:
    """Number of defined bits in the rice stream (the reference leaves any
    trailing bits of the final byte uninitialized — malloc garbage, see
    press/press.c:4893-4924 which writes exactly n bits)."""
    v = np.asarray(data, dtype=np.uint8).astype(np.int64)
    k = rice_find_k(v)
    return 3 + int((v >> k).sum()) + v.size * (1 + k)


def rice_encode(data: np.ndarray) -> bytes:
    v = np.asarray(data, dtype=np.uint8).astype(np.int64)
    k = rice_find_k(v)
    q = v >> k
    lens = q + 1 + k
    offs = 3 + np.cumsum(lens) - lens  # start bit of each code
    total_bits = 3 + int(lens.sum())
    bits = np.zeros((total_bits + 7) // 8 * 8, dtype=np.uint8)
    bits[0] = (k >> 2) & 1
    bits[1] = (k >> 1) & 1
    bits[2] = k & 1
    # unary: runs of ones
    total_q = int(q.sum())
    if total_q:
        run_starts = np.repeat(offs, q)
        intra = np.arange(total_q) - np.repeat(np.cumsum(q) - q, q)
        bits[run_starts + intra] = 1
    # terminating zero already 0; value bits MSB-first
    for j in range(k):
        bits[offs + q + 1 + j] = ((v >> (k - 1 - j)) & 1).astype(np.uint8)
    return np.packbits(bits, bitorder="little").tobytes()


def rice_decode(stream: bytes, n: int) -> np.ndarray:
    raw = np.frombuffer(stream, dtype=np.uint8)
    bits = np.unpackbits(raw, bitorder="little")
    k = (int(bits[0]) << 2) | (int(bits[1]) << 1) | int(bits[2])
    out = np.empty(n, dtype=np.uint8)
    pos = 3
    m = 1 << k
    kw = (1 << np.arange(k - 1, -1, -1)).astype(np.int64) if k else None
    for i in range(n):
        # unary run length = distance to next zero bit
        q = int(np.argmin(bits[pos : pos + 260]))  # first 0; q <= 255 >> k
        pos += q + 1
        x = m * q
        if k:
            x |= int(bits[pos : pos + k] @ kw)
            pos += k
        out[i] = x
    return out


class RiceVbZdCodec(Codec):
    """rice_<kind>_zd: [zd0:u16][ex block raw][rice(1B data)]"""

    def __init__(self, kind: str):
        self.kind = kind
        self.name = f"rice_{kind}_zd"
        self._vb_press, self._vb_depress = PAYLOAD[kind]

    def bound(self, nin: int) -> int:
        return 2 + nin * 2 + 1024

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        vb = self._vb_press(zd[1:])
        exlen = exblock_len(vb, 0, "vbe21" if self.kind == "vbe21" else self.kind)
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        return zd[:1].astype("<u2").tobytes() + vb[:exlen] + rice_encode(data)

    def depress(self, stream, nin):
        exlen = exblock_len(stream, 2, "vbe21" if self.kind == "vbe21" else self.kind)
        import struct

        (nex,) = struct.unpack_from("<I", stream, 2)
        ndata = nin - 1 - nex
        data = rice_decode(stream[2 + exlen :], ndata)
        vb = stream[2 : 2 + exlen] + data.tobytes()
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1)[0]
        zd[1:] = self._vb_depress(vb, nin - 1)
        return unzigdelta(zd)


for _kind in ("vbe21", "vbbe21", "vbsbe21", "vbsse21"):
    register(RiceVbZdCodec(_kind))
