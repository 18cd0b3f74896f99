"""Minbits bit-packing methods: uintx, uint, uint_submin, uint_zd, uint_zsm.

Stream framings (reference: press/press.c:489-738):
  uint        [minbits:1B][MSB-first packed fields]
  uint_submin [min:u16 LE][uint of (x - min)]
  uint_zd     [first sample:i16 LE][uint of zigzag-deltas (nin-1 values)]
  uint_zsm    [mean:i16 LE][uint of zigzag(x - mean), nin values]
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.kernels.bitpack import minbits, pack_bits, unpack_bits
from honours_tpu.transforms.core import (
    unzigdelta,
    unzigzag16,
    zigdelta,
    zigzag16,
)


def uint_press_u16(values: np.ndarray) -> bytes:
    """[minbits:1B][packed]; values treated as uint16."""
    v = np.asarray(values).astype(np.uint16)
    b = minbits(int(v.max()) if v.size else 0)
    return bytes([b]) + pack_bits(v, b)


def uint_depress_u16(stream: bytes, n: int) -> np.ndarray:
    b = stream[0]
    return unpack_bits(stream[1:], b, n, np.uint16)


def uint_press_u32(values: np.ndarray) -> bytes:
    v = np.asarray(values).astype(np.uint32)
    b = minbits(int(v.max()) if v.size else 0)
    return bytes([b]) + pack_bits(v, b)


def uint_depress_u32(stream: bytes, n: int) -> np.ndarray:
    b = stream[0]
    return unpack_bits(stream[1:], b, n, np.uint32)


class UintxCodec(Codec):
    """Fixed-width bitpack with no header (press/press.c:55-72).

    Only lossless when every uint16 sample fits `bits` bits (the
    reference's uint11 benchmark assumes 11-significant-bit P11 data)."""

    def __init__(self, bits: int, name: str = None):
        self.bits = bits
        self.name = name or f"uintx_{bits}"

    def bound(self, nin: int) -> int:
        return (nin * self.bits + 7) // 8

    def press(self, signal: np.ndarray) -> bytes:
        return pack_bits(np.asarray(signal).astype(np.uint16), self.bits)

    def depress(self, stream: bytes, nin: int) -> np.ndarray:
        return unpack_bits(stream, self.bits, nin, np.uint16).astype(np.int16)


class UintCodec(Codec):
    name = "uint"

    def bound(self, nin: int) -> int:
        return 1 + nin * 2

    def press(self, signal: np.ndarray) -> bytes:
        return uint_press_u16(np.asarray(signal, dtype=np.int16).view(np.uint16))

    def depress(self, stream: bytes, nin: int) -> np.ndarray:
        return uint_depress_u16(stream, nin).astype(np.int16)


class UintSubminCodec(Codec):
    name = "uint_submin"

    def bound(self, nin: int) -> int:
        return 2 + 1 + nin * 2

    def press(self, signal: np.ndarray) -> bytes:
        u = np.asarray(signal, dtype=np.int16).view(np.uint16)
        mn = int(u.min()) if u.size else 0
        return struct.pack("<H", mn) + uint_press_u16((u - np.uint16(mn)))

    def depress(self, stream: bytes, nin: int) -> np.ndarray:
        (mn,) = struct.unpack_from("<H", stream, 0)
        v = uint_depress_u16(stream[2:], nin)
        return (v + np.uint16(mn)).astype(np.int16)


class UintZdCodec(Codec):
    name = "uint_zd"

    def bound(self, nin: int) -> int:
        return 2 + 1 + nin * 2

    def press(self, signal: np.ndarray) -> bytes:
        x = np.asarray(signal, dtype=np.int16)
        zd = zigzag16((x[1:].view(np.uint16) - x[:-1].view(np.uint16)))
        return struct.pack("<h", int(x[0]) if x.size else 0) + uint_press_u16(zd)

    def depress(self, stream: bytes, nin: int) -> np.ndarray:
        (first,) = struct.unpack_from("<h", stream, 0)
        zd = uint_depress_u16(stream[2:], nin - 1)
        first_u = np.uint16(first & 0xFFFF)
        out = np.empty(nin, dtype=np.uint16)
        out[0] = first_u
        deltas = unzigzag16(zd)
        out[1:] = first_u + np.cumsum(deltas, dtype=np.uint16)
        return out.astype(np.int16)


class UintZsmCodec(Codec):
    name = "uint_zsm"

    def bound(self, nin: int) -> int:
        return 2 + 1 + nin * 2

    @staticmethod
    def _mean16(x: np.ndarray) -> int:
        # exact replica of the serial double-precision running mean with
        # int16 truncation (press/util.c:74-88 get_mean_16)
        mean = 0.0
        for i, v in enumerate(x.astype(np.float64)):
            mean += (v - mean) / (i + 1)
        return int(np.float64(mean))  # C cast truncates toward zero

    def press(self, signal: np.ndarray) -> bytes:
        x = np.asarray(signal, dtype=np.int16)
        mean = np.int16(self._mean16(x) if x.size else 0)
        zsm = zigzag16((x.view(np.uint16) - np.uint16(mean)))
        return struct.pack("<h", int(mean)) + uint_press_u16(zsm)

    def depress(self, stream: bytes, nin: int) -> np.ndarray:
        (mean,) = struct.unpack_from("<h", stream, 0)
        z = uint_depress_u16(stream[2:], nin)
        return (unzigzag16(z) + np.uint16(mean)).astype(np.int16)


register(UintxCodec(16))
register(UintxCodec(11, name="uint11"))
register(UintCodec())
register(UintSubminCodec())
register(UintZdCodec())
register(UintZsmCodec())
