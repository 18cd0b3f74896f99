"""Optimal flat-region partitioner (`flat_uint_submin`).

The reference builds an O(n^2) triangular metadata table and recursive
split search (press/flat.c:66-183; disabled in its own benchmark for
being too slow, press/test.c:6122).  This is the same capability as a
proper 1-D optimal-partition DP:

  best[j] = min_i best[i] + cost(i, j)
  cost(i, j) = seg header + len * minbits(max-min of in[i:j])

with boundaries restricted to multiples of `step` and O(1) range min/max
from sparse tables — O((n/step)^2) time, O(n log n) space.

Stream format (ours; the reference's variant never stabilized):
  [nseg:u32][seg boundaries as svb32 of length deltas]
  per segment: [min:u16][minbits:1B][MSB-first packed (x - min)]
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.kernels.bitpack import minbits, pack_bits, unpack_bits
from honours_tpu.kernels.svb import svb32_decode, svb32_encode

SEG_HDR_BYTES = 3  # min u16 + minbits u8


def _sparse_tables(u: np.ndarray):
    n = u.size
    levels = max(1, n.bit_length())
    mins = [u]
    maxs = [u]
    k = 1
    while (1 << k) <= n:
        prev_min, prev_max = mins[-1], maxs[-1]
        half = 1 << (k - 1)
        mins.append(np.minimum(prev_min[:-half], prev_min[half:]))
        maxs.append(np.maximum(prev_max[:-half], prev_max[half:]))
        k += 1
    return mins, maxs


def _range_minmax(mins, maxs, i, j):
    """min/max of u[i:j] (j exclusive) via sparse table."""
    length = j - i
    k = length.bit_length() - 1
    half = 1 << k
    mn = np.minimum(mins[k][i], mins[k][j - half])
    mx = np.maximum(maxs[k][i], maxs[k][j - half])
    return mn, mx


def partition_flats(u: np.ndarray, step: int = 64):
    """Return optimal step-aligned boundaries [0, b1, ..., n]."""
    n = u.size
    bounds = list(range(0, n, step)) + [n]
    m = len(bounds) - 1
    mins, maxs = _sparse_tables(u)
    INF = float("inf")
    best = [0.0] + [INF] * m
    prev = [0] * (m + 1)
    for j in range(1, m + 1):
        bj = bounds[j]
        for i in range(j):
            bi = bounds[i]
            mn, mx = _range_minmax(mins, maxs, bi, bj)
            cost = best[i] + SEG_HDR_BYTES + ((bj - bi) * minbits(int(mx - mn)) + 7) // 8
            if cost < best[j]:
                best[j] = cost
                prev[j] = i
    cuts = [m]
    while cuts[-1] != 0:
        cuts.append(prev[cuts[-1]])
    return [bounds[c] for c in reversed(cuts)]


class FlatUintSubminCodec(Codec):
    name = "flat_uint_submin"

    def __init__(self, step: int = None):
        from honours_tpu.utils.config import get_config

        self.step = step or get_config().flats_step

    def bound(self, nin: int) -> int:
        return 8 + nin * 3 + 64

    def press(self, signal):
        u = np.asarray(signal, dtype=np.int16).view(np.uint16)
        if u.size == 0:
            return struct.pack("<I", 0)
        cuts = partition_flats(u, self.step)
        seg_lens = np.diff(cuts).astype(np.uint32)
        out = [struct.pack("<I", seg_lens.size), svb32_encode(seg_lens)]
        for a, b in zip(cuts[:-1], cuts[1:]):
            seg = u[a:b]
            mn = int(seg.min())
            v = (seg - np.uint16(mn)).astype(np.uint16)
            bbits = minbits(int(v.max()))
            out.append(struct.pack("<HB", mn, bbits))
            out.append(pack_bits(v, bbits))
        return b"".join(out)

    def depress(self, stream, nin):
        (nseg,) = struct.unpack_from("<I", stream, 0)
        if nseg == 0:
            return np.zeros(0, dtype=np.int16)
        seg_lens, used = svb32_decode(stream[4:], nseg)
        off = 4 + used
        out = np.empty(nin, dtype=np.uint16)
        pos = 0
        for ln in seg_lens.astype(int):
            mn, bbits = struct.unpack_from("<HB", stream, off)
            off += 3
            nbytes = (ln * bbits + 7) // 8
            v = unpack_bits(stream[off : off + nbytes], bbits, ln)
            off += nbytes
            out[pos : pos + ln] = v + np.uint16(mn)
            pos += ln
        return out.view(np.int16).copy()


register(FlatUintSubminCodec())
