"""FLAC-class audio codec: fixed polynomial predictors + Rice residuals.

The reference wraps libFLAC (press/press.c:2188-2528, flac method at
P11 settings).  Rather than port a container format built for audio
players, this is a from-scratch codec of the same family: per block,
the best fixed predictor of order 0-4 (FLAC's fixed predictors) is
chosen, residuals are zigzagged and Rice-coded with an optimal per-block
parameter, with a verbatim escape for incompressible blocks.

Stream format (ours):
  per 4096-sample block:
    [mode:1B]  0-4 = predictor order, 15 = verbatim
    verbatim: [samples: 2B LE x blocklen]
    else:     [k:1B][warmup: 2B LE x order][rice bits of zigzag residuals,
               LSB-first bit order, byte aligned per block]
Block length is fixed at 4096 (shorter final block); sample count comes
from the container, as everywhere else in the framework.
"""

from __future__ import annotations

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.generic import OuterLayerCodec

BLOCK = 4096
VERBATIM = 15


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _zigzag64(r: np.ndarray) -> np.ndarray:
    return ((r << 1) ^ (r >> 63)).astype(np.uint64)


def _unzigzag64(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint64)
    return ((z >> np.uint64(1)) ^ (np.uint64(0) - (z & np.uint64(1)))).astype(
        np.int64
    )


def _best_k(z: np.ndarray) -> int:
    if z.size == 0:
        return 0
    mean = float(z.mean())
    k0 = max(0, int(mean).bit_length() - 1)
    best_k, best = 0, None
    for k in range(max(0, k0 - 2), min(31, k0 + 3)):
        cost = int((z >> np.uint64(k)).sum()) + z.size * (1 + k)
        if best is None or cost < best:
            best, best_k = cost, k
    return best_k


def _rice_bits(z: np.ndarray, k: int) -> np.ndarray:
    """LSB-first bit array of rice codes (q ones, 0, k low bits LSB-first)."""
    q = (z >> np.uint64(k)).astype(np.int64)
    lens = q + 1 + k
    offs = np.cumsum(lens) - lens
    total = int(lens.sum())
    bits = np.zeros((total + 7) // 8 * 8, dtype=np.uint8)
    tq = int(q.sum())
    if tq:
        run_starts = np.repeat(offs, q)
        intra = np.arange(tq) - np.repeat(np.cumsum(q) - q, q)
        bits[run_starts + intra] = 1
    for j in range(k):
        bits[offs + q + 1 + j] = ((z >> np.uint64(j)) & np.uint64(1)).astype(
            np.uint8
        )
    return bits


def _rice_unbits(bits: np.ndarray, k: int, count: int) -> np.ndarray:
    out = np.empty(count, dtype=np.uint64)
    pos = 0
    kw = (np.uint64(1) << np.arange(k, dtype=np.uint64)) if k else None
    for i in range(count):
        q = 0
        while bits[pos]:
            q += 1
            pos += 1
        pos += 1
        v = np.uint64(q) << np.uint64(k)
        if k:
            v |= np.uint64(bits[pos : pos + k].astype(np.uint64) @ kw)
            pos += k
        out[i] = v
    return out


class FlacCodec(Codec):
    name = "flac"

    def bound(self, nin: int) -> int:
        return nin * 3 + 64

    def press(self, signal):
        x = np.asarray(signal, dtype=np.int16)
        out = []
        for a in range(0, x.size, BLOCK):
            blk = x[a : a + BLOCK]
            best = None
            for order in range(min(5, blk.size)):
                r = _fixed_residual(blk, order)
                z = _zigzag64(r)
                k = _best_k(z)
                cost = (
                    2
                    + 2 * order
                    + (int((z >> np.uint64(k)).sum()) + z.size * (1 + k) + 7) // 8
                )
                if best is None or cost < best[0]:
                    best = (cost, order, k, z)
            if best is None or best[0] >= 1 + 2 * blk.size:
                out.append(bytes([VERBATIM]))
                out.append(blk.astype("<i2").tobytes())
                continue
            _, order, k, z = best
            out.append(bytes([order, k]))
            out.append(blk[:order].astype("<i2").tobytes())
            out.append(np.packbits(_rice_bits(z, k), bitorder="little").tobytes())
        return b"".join(out)

    def depress(self, stream, nin):
        out = np.empty(nin, dtype=np.int16)
        off = 0
        pos = 0
        while pos < nin:
            blen = min(BLOCK, nin - pos)
            mode = stream[off]
            off += 1
            if mode == VERBATIM:
                out[pos : pos + blen] = np.frombuffer(
                    stream, dtype="<i2", count=blen, offset=off
                )
                off += 2 * blen
                pos += blen
                continue
            order = mode
            k = stream[off]
            off += 1
            warm = np.frombuffer(stream, dtype="<i2", count=order, offset=off)
            off += 2 * order
            count = blen - order
            # conservative upper bound on rice byte length, then re-trim by
            # decoding from a bit view of the remainder
            bits = np.unpackbits(
                np.frombuffer(stream, dtype=np.uint8, offset=off),
                bitorder="little",
            )
            z = _rice_unbits(bits, k, count)
            nbits = int((z >> np.uint64(k)).sum()) + count * (1 + k)
            off += (nbits + 7) // 8
            # integrate `order` times: D^o = [D^o[0], D^o[0] + cumsum(D^{o+1})]
            # where D^o[0] comes from the warmup samples
            seq = _unzigzag64(z)
            for o in range(order - 1, -1, -1):
                first = _fixed_residual(warm, o)[0]
                seq = np.concatenate([[first], first + np.cumsum(seq)])
            out[pos : pos + blen] = seq.astype(np.int16)
            pos += blen
        return out


_flac = register(FlacCodec())
register(OuterLayerCodec("zstd", _flac, with_nin=False, name="zstd_flac"))
