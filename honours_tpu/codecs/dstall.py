"""dstall_srans2 — stall-aware srans2 flagship (TPU-native dstall).

The reference's best-ratio method dstall_fz (press/press.c:7986-8030)
encodes each read both with and without a stall split and keeps the
smaller stream; its branch codecs are the serial context-mixing range
coder.  Here both branches are the batched-decodable srans2
(zd -> vbbe21 -> canned order-1 rANS): the zigzag-delta transform
handles the flat stall region as well as the reference's submin branch
does (near-zero deltas land in the o1 table's densest contexts), and a
single canned table serves both branches so the whole method stays
table-free on the wire.  The min-pick guarantees ratio >= srans2 per
read up to 5 framing bytes.

Stream format (adapted from press/press.c:7769-7794 with a u32 stall
blob length — our stall blobs can exceed 64 KiB):
  [exists:1B]
  exists=1: [start:u16][length:u16][stall_len:u32][stall srans2 blob]
  [ns_len:u32][nonstall srans2 blob]
with the reference's 20-sample margins trimmed from each stall end and
threshold 140 (press/press.c:7763, 7772-7773).  Stalls with start or
length beyond u16 range are treated as absent (stalls sit at the read
start; this never triggers on real signal).
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu import native
from honours_tpu.codecs.base import Codec, get, register
from honours_tpu.utils.config import get_config


def _split(signal: np.ndarray):
    """(exists, start, length) after threshold/margin/u16 guards."""
    cfg = get_config()
    x = np.asarray(signal, dtype=np.int16)
    exists, start, length = native.find_stall(x)
    if length < cfg.stall_threshold:
        return False, 0, 0
    start += cfg.stall_margin
    length -= 2 * cfg.stall_margin
    if length <= 0 or start > 0xFFFF or length > 0xFFFF:
        return False, 0, 0
    return True, start, length


class DstallSrans2Codec(Codec):
    name = "dstall_srans2"

    def bound(self, nin: int) -> int:
        return 16 + 4 * nin + 2048

    def press(self, signal):
        x = np.asarray(signal, dtype=np.int16)
        c = get("srans2_vbbe21_zd")
        plain_blob = c.press(x)
        plain = b"\x00" + struct.pack("<I", len(plain_blob)) + plain_blob
        exists, start, length = _split(x)
        if not exists:
            return plain
        stall_blob = c.press(x[start : start + length])
        ns = np.concatenate([x[:start], x[start + length :]])
        ns_blob = c.press(ns)
        split = (
            b"\x01"
            + struct.pack("<HHI", start, length, len(stall_blob))
            + stall_blob
            + struct.pack("<I", len(ns_blob))
            + ns_blob
        )
        return split if len(split) < len(plain) else plain

    def depress(self, stream, nin):
        c = get("srans2_vbbe21_zd")
        exists = stream[0]
        off = 1
        start = length = 0
        out = np.empty(nin, dtype=np.int16)
        if exists:
            start, length, stall_len = struct.unpack_from("<HHI", stream, off)
            off += 8
            out[start : start + length] = c.depress(
                stream[off : off + stall_len], length
            )
            off += stall_len
        (ns_len,) = struct.unpack_from("<I", stream, off)
        off += 4
        ns = c.depress(stream[off : off + ns_len], nin - length)
        out[:start] = ns[:start]
        out[start + length :] = ns[start:]
        return out


register(DstallSrans2Codec())
