"""Huffman entropy codecs over vb containers.

huffman_vb*_zd  — dynamic: per-read table embedded in the stream
  payload = [zd0:u16][ex block raw][huffman_encode_memory blob]
  blob = [table: count-1:1B, dataBytes:u32 BE, entries][bit stream]
  (reference: press/press.c:3965-4402; blob format
   press/huffman/huffman.c:483-540, 713-800)

shuffman_vb*_zd — static: canned NA12878 table, blob is
  [dataBytes:u32 BE][bit stream] only
  (reference: press/press.c:4409-4852; press/huffman/huffman.c:1184-1264)
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.kernels.huffman_np import huffman_decode, huffman_encode
from honours_tpu.tables.huffman import (
    build_table,
    na12878_table,
    parse_memory,
    serialize_memory,
)
from honours_tpu.transforms.core import unzigdelta, zigdelta


def huffman_encode_memory(data: np.ndarray) -> bytes:
    d = np.asarray(data, dtype=np.uint8)
    freq = np.bincount(d, minlength=256)
    table = build_table(freq)
    return serialize_memory(table, d.size) + huffman_encode(d, table)


def huffman_decode_memory(blob: bytes) -> np.ndarray:
    table, data_bytes, off = parse_memory(blob)
    return huffman_decode(blob[off:], data_bytes, table)


def shuffman_encode_memory(data: np.ndarray) -> bytes:
    d = np.asarray(data, dtype=np.uint8)
    return struct.pack(">I", d.size) + huffman_encode(d, na12878_table())


def shuffman_decode_memory(blob: bytes) -> np.ndarray:
    (data_bytes,) = struct.unpack_from(">I", blob, 0)
    return huffman_decode(blob[4:], data_bytes, na12878_table())


class _HuffVbZd(Codec):
    static = False

    def __init__(self, kind: str):
        self.kind = kind
        prefix = "shuffman" if self.static else "huffman"
        self.name = f"{prefix}_{kind}_zd"
        self._vb_press, self._vb_depress = PAYLOAD[kind]

    def bound(self, nin: int) -> int:
        return 2 + nin * 2 + 2048

    def _exkind(self):
        return "vbe21" if self.kind == "vbe21" else self.kind

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        vb = self._vb_press(zd[1:])
        exlen = exblock_len(vb, 0, self._exkind())
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        enc = shuffman_encode_memory(data) if self.static else huffman_encode_memory(
            data
        )
        return zd[:1].astype("<u2").tobytes() + vb[:exlen] + enc

    def depress(self, stream, nin):
        exlen = exblock_len(stream, 2, self._exkind())
        blob = stream[2 + exlen :]
        data = shuffman_decode_memory(blob) if self.static else huffman_decode_memory(
            blob
        )
        vb = stream[2 : 2 + exlen] + data.tobytes()
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1)[0]
        zd[1:] = self._vb_depress(vb, nin - 1)
        return unzigdelta(zd)


class HuffmanVbZd(_HuffVbZd):
    static = False


class ShuffmanVbZd(_HuffVbZd):
    static = True


for _kind in ("vbe21", "vbbe21", "vbsbe21", "vbsse21"):
    register(HuffmanVbZd(_kind))
    register(ShuffmanVbZd(_kind))
