"""srans_vbbe21_zd (format v2: shared-stream interleaved rANS body) — the TPU-native flagship codec (new method, no
reference counterpart).

Static-table interleaved rANS over the vbbe21 residual bytes, using a
canned CDF derived from the NA12878 zigzag-delta frequencies
(press/gen_huffman.c:11-16 — the same statistics behind the shuff-*
methods).  Fractional-bit coding beats the static Huffman table's
integer-bit codes while decode stays lane-parallel on TPU.

Stream: [zd0:u16][vbbe21 exception block][rANS body (no table)].
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.kernels.rans import (
    normalize_freqs,
    rans_bound,
    rans_decode_shared,
    rans_encode_shared,
)
from honours_tpu.tables.huffman import NA12878_ZD_FREQ
from honours_tpu.transforms.core import unzigdelta, zigdelta

_CANNED_FREQS = None


def canned_freqs() -> np.ndarray:
    global _CANNED_FREQS
    if _CANNED_FREQS is None:
        _CANNED_FREQS = normalize_freqs(np.asarray(NA12878_ZD_FREQ))
    return _CANNED_FREQS


class SransVbbe21ZdCodec(Codec):
    name = "srans_vbbe21_zd"

    def bound(self, nin: int) -> int:
        return 2 + rans_bound(2 * nin)

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        vb = PAYLOAD["vbbe21"][0](zd[1:])
        exlen = exblock_len(vb, 0, "vbbe21")
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        body = rans_encode_shared(data, canned_freqs())
        return zd[:1].astype("<u2").tobytes() + vb[:exlen] + body

    def depress(self, stream, nin):
        exlen = exblock_len(stream, 2, "vbbe21")
        (nex,) = struct.unpack_from("<I", stream, 2)
        data = rans_decode_shared(stream[2 + exlen :], nin - 1 - nex, canned_freqs())
        vb = stream[2 : 2 + exlen] + data.tobytes()
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1)[0]
        zd[1:] = PAYLOAD["vbbe21"][1](vb, nin - 1)
        return unzigdelta(zd)


register(SransVbbe21ZdCodec())
