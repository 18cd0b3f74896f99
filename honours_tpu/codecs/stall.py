"""Stall-aware codecs: rccm_svbbe21_zd ("stall-fz"), dstall_fz_1500,
dstall_fz (the reference's best-ratio method, BASELINE dstall-fz 2.9917).

Stream format (reference: press/press.c:7748-8030):
  [exists:1B]
  if exists: [start:u16][len:u16][stall_press_len:u16]
             [stall | submin | vbbe21 | rccm]
  [nonstall_press_len:u32][nonstall | zd | vbbe21 | rccm]
with a 20-sample margin trimmed from each stall end
(press/press.c:7772-7773), stall threshold 140 (stall-fz) or 1500
(dstall_fz_1500); dstall_fz encodes both ways and keeps the smaller
(press/press.c:8003-8019).
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu import native
from honours_tpu.codecs.base import Codec, get, register
from honours_tpu.utils.config import get_config


def _stall_press(signal: np.ndarray, threshold: int) -> bytes:
    x = np.asarray(signal, dtype=np.int16)
    margin = get_config().stall_margin
    exists, start, length = native.find_stall(x)
    if length < threshold:
        exists, start, length = False, 0, 0
    out = [bytes([1 if exists else 0])]
    if exists:
        start += margin
        length -= 2 * margin
        stall_blob = get("rccm_vbbe21_submin").press(x[start : start + length])
        out.append(struct.pack("<HHH", start, length, len(stall_blob)))
        out.append(stall_blob)
    nonstall = np.concatenate([x[:start], x[start + length :]])
    ns_blob = get("rccm_vbbe21_zd").press(nonstall)
    out.append(struct.pack("<I", len(ns_blob)))
    out.append(ns_blob)
    return b"".join(out)


def _stall_depress(stream: bytes, nin: int) -> np.ndarray:
    exists = stream[0]
    off = 1
    start = length = 0
    out = np.empty(nin, dtype=np.int16)
    if exists:
        start, length, stall_len_press = struct.unpack_from("<HHH", stream, off)
        off += 6
        stall = get("rccm_vbbe21_submin").depress(
            stream[off : off + stall_len_press], length
        )
        off += stall_len_press
        out[start : start + length] = stall
    (ns_len,) = struct.unpack_from("<I", stream, off)
    off += 4
    nonstall = get("rccm_vbbe21_zd").depress(stream[off : off + ns_len], nin - length)
    out[:start] = nonstall[:start]
    out[start + length :] = nonstall[start:]
    return out


class StallFzCodec(Codec):
    """rccm_svbbe21_zd — always-try-stall with threshold 140."""

    name = "rccm_svbbe21_zd"

    @property
    def threshold(self):
        return get_config().stall_threshold

    def bound(self, nin: int) -> int:
        return 16 + 4 * nin + 1024

    def press(self, signal):
        return _stall_press(signal, self.threshold)

    def depress(self, stream, nin):
        return _stall_depress(stream, nin)


class DstallFz1500Codec(StallFzCodec):
    name = "dstall_fz_1500"

    @property
    def threshold(self):
        return get_config().dstall_threshold


class DstallFzCodec(Codec):
    """dstall_fz — encode with and without stall split, keep the smaller."""

    name = "dstall_fz"

    def bound(self, nin: int) -> int:
        return 16 + 4 * nin + 1024

    def press(self, signal):
        with_stall = _stall_press(signal, get_config().stall_threshold)
        ns_blob = get("rccm_vbbe21_zd").press(signal)
        without = bytes([0]) + struct.pack("<I", len(ns_blob)) + ns_blob
        return with_stall if len(with_stall) < len(without) else without

    def depress(self, stream, nin):
        return _stall_depress(stream, nin)


register(StallFzCodec())
register(DstallFz1500Codec())
register(DstallFzCodec())
