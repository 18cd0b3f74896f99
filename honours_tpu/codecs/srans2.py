"""srans2_vbbe21_zd — order-1 static-CDF rANS flagship (format v3 body).

The TPU-native answer to the reference's best general-purpose class,
rccm_vbbe21_zd / "rc01s" (press/press.c:6906 over Turbo-Range-Coder
rcmsenc): keep the order-1 conditioning that gives rc01s its edge, but
replace the serial adaptive context mixer with a canned 257x256 12-bit
CDF (tables/o1.py) over block-interleaved rANS lanes, so encode AND
decode stay lane-parallel on TPU.  Fractional-bit coding + conditioning
beats the static Huffman table (shuff-*) and the order-0 srans.

Stream: [zd0:u16][vbbe21 exception block][v3 o1 rANS body].
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.kernels.rans import (
    rans_bound,
    rans_decode_o1,
    rans_encode_o1,
)
from honours_tpu.tables.o1 import canned_o1_freqs
from honours_tpu.transforms.core import unzigdelta, zigdelta


class Srans2Vbbe21ZdCodec(Codec):
    name = "srans2_vbbe21_zd"

    def bound(self, nin: int) -> int:
        return 2 + 4 + rans_bound(2 * nin)

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        vb = PAYLOAD["vbbe21"][0](zd[1:])
        exlen = exblock_len(vb, 0, "vbbe21")
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        body = rans_encode_o1(data, canned_o1_freqs())
        return zd[:1].astype("<u2").tobytes() + vb[:exlen] + body

    def depress(self, stream, nin):
        exlen = exblock_len(stream, 2, "vbbe21")
        (nex,) = struct.unpack_from("<I", stream, 2)
        data = rans_decode_o1(
            stream[2 + exlen :], nin - 1 - nex, canned_o1_freqs()
        )
        vb = stream[2 : 2 + exlen] + data.tobytes()
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1)[0]
        zd[1:] = PAYLOAD["vbbe21"][1](vb, nin - 1)
        return unzigdelta(zd)


register(Srans2Vbbe21ZdCodec())
