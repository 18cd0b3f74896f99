"""srans3_vbbe21_zd (format v4: nibble-factorized order-1 rANS body) —
EXPERIMENTAL alternative format, not a flagship.

Same stream skeleton as srans2 ([zd0:u16][vbbe21 exception block][body])
with the v4 nibble body: each residual byte codes as two 4-bit symbols
(hi conditioned on the canned o1 context cluster, lo on the clustered
(cluster, hi) pair — tables/o1n.py, derived deterministically from the
srans2 table).  The design bet was that a 16-wide decode search beats
srans2's 256-wide one; chip measurements refuted it (r3: 0.20/0.20 GB/s
vs srans2's 0.80/0.46 — two steps per byte double the serial chain,
and r4 ablations show the search cost is insensitive to its width, so
halving the width buys nothing while doubling the steps).  Kept as a
complete, tested format because the nibble factorization machinery
(tables/o1n.py cluster derivation, engine/rans_n4_pallas.py) documents
the measured dead end; ratio also trails srans2 by ~0.33%.
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.kernels.rans import rans_bound, rans_decode_o1n, rans_encode_o1n
from honours_tpu.tables.o1n import canned_nibble_tables
from honours_tpu.transforms.core import unzigdelta, zigdelta


class Srans3Vbbe21ZdCodec(Codec):
    name = "srans3_vbbe21_zd"

    def bound(self, nin: int) -> int:
        return 2 + rans_bound(2 * nin) + 8

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        vb = PAYLOAD["vbbe21"][0](zd[1:])
        exlen = exblock_len(vb, 0, "vbbe21")
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        body = rans_encode_o1n(data, canned_nibble_tables())
        return zd[:1].astype("<u2").tobytes() + vb[:exlen] + body

    def depress(self, stream, nin):
        exlen = exblock_len(stream, 2, "vbbe21")
        (nex,) = struct.unpack_from("<I", stream, 2)
        data = rans_decode_o1n(
            stream[2 + exlen :], nin - 1 - nex, canned_nibble_tables()
        )
        vb = stream[2 : 2 + exlen] + data.tobytes()
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1)[0]
        zd[1:] = PAYLOAD["vbbe21"][1](vb, nin - 1)
        return unzigdelta(zd)


register(Srans3Vbbe21ZdCodec())
