"""turbopfor: block-wise patched frame-of-reference over zigzag-deltas.

The reference delegates to TurboPFor's p4nzenc128v16 but the method is
disabled in its own benchmark ("double free or corruption",
press/test.c:6145).  This is a working from-scratch PFor of the same
family: 128-value blocks, per-block bit width b chosen to make ~90% of
values fit, values above the threshold patched via an exception list.

Stream format (ours):
  per 128-value block of the zigzag-delta stream (prev=0):
    [b:1B][nex:1B][packed low b bits of all values (MSB-first)]
    [ex idx:1B x nex][ex high bits: u16 LE x nex]
"""

from __future__ import annotations

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.kernels.bitpack import minbits, pack_bits, unpack_bits
from honours_tpu.transforms.core import unzigdelta, zigdelta

BLOCK = 128


def _choose_b(z: np.ndarray) -> int:
    """Smallest width covering >= 90% of the block (cost heuristic)."""
    best_b, best_cost = 16, None
    bits = np.array([minbits(int(v)) for v in z])
    for b in range(0, 17):
        nex = int((bits > b).sum())
        cost = 2 + (z.size * b + 7) // 8 + 3 * nex
        if best_cost is None or cost < best_cost:
            best_cost, best_b = cost, b
    return best_b


class TurboPforCodec(Codec):
    name = "turbopfor"

    def bound(self, nin: int) -> int:
        return nin * 3 + 64

    def press(self, signal):
        z = zigdelta(np.asarray(signal, dtype=np.int16))
        out = []
        for a in range(0, z.size, BLOCK):
            blk = z[a : a + BLOCK].astype(np.uint16)
            b = _choose_b(blk)
            mask = blk >= (1 << b) if b < 16 else np.zeros(blk.size, bool)
            ex_idx = np.nonzero(mask)[0].astype(np.uint8)
            ex_hi = (blk[mask] >> b).astype("<u2")
            low = blk & np.uint16((1 << b) - 1) if b else np.zeros_like(blk)
            out.append(bytes([b, ex_idx.size]))
            out.append(pack_bits(low, b))
            out.append(ex_idx.tobytes())
            out.append(ex_hi.tobytes())
        return b"".join(out)

    def depress(self, stream, nin):
        z = np.empty(nin, dtype=np.uint16)
        off = 0
        for a in range(0, nin, BLOCK):
            blen = min(BLOCK, nin - a)
            b, nex = stream[off], stream[off + 1]
            off += 2
            nbytes = (blen * b + 7) // 8
            low = unpack_bits(stream[off : off + nbytes], b, blen)
            off += nbytes
            ex_idx = np.frombuffer(stream, np.uint8, count=nex, offset=off)
            off += nex
            ex_hi = np.frombuffer(stream, "<u2", count=nex, offset=off)
            off += 2 * nex
            blk = low.astype(np.uint32)
            blk[ex_idx] |= ex_hi.astype(np.uint32) << b
            z[a : a + blen] = blk.astype(np.uint16)
        return unzigdelta(z)


register(TurboPforCodec())
