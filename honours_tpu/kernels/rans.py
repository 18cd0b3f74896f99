"""Interleaved static-CDF rANS over bytes (numpy host path).

The TPU-native replacement for the reference's CDF range coder
(press/Turbo-Range-Coder rccdfenc used by rccdf_vb*_zd,
press/press.c:7309-7721): a static 12-bit CDF + K independent rANS lanes
so decode vectorizes across lanes (and across reads in the batched
engine).  Encode walks symbols in reverse per lane; decode is the forward
mirror.  PAPERS.md "RAS: A Bit-Exact rANS Accelerator" is the design
reference for the interleaved formulation.

Stream layout:
  [bitmap:32B of present symbols]
  [12-bit freqs of present symbols, MSB-first packed]
  [K final states:u32 LE x K]
  [K lane byte lengths: u32 LE x K]
  [lane 0 bytes][lane 1 bytes]...
Lane i owns symbols i, i+K, i+2K, ...
"""

from __future__ import annotations

import numpy as np

from honours_tpu.kernels.bitpack import pack_bits, unpack_bits

PROB_BITS = 12
M = 1 << PROB_BITS
RANS_L = 1 << 23
K_DEFAULT = 16


def normalize_freqs(counts: np.ndarray) -> np.ndarray:
    """Normalize to sum M with every present symbol >= 1 (deterministic)."""
    counts = np.asarray(counts, dtype=np.int64)
    total = counts.sum()
    if total == 0:
        return np.zeros(256, dtype=np.int64)
    f = counts * M // total
    f[(counts > 0) & (f == 0)] = 1
    diff = M - f.sum()
    # adjust the largest entries (stable order) until the sum is exact
    order = np.argsort(-f, kind="stable")
    i = 0
    while diff != 0:
        s = order[i % len(order)]
        step = 1 if diff > 0 else -1
        if f[s] + step >= 1 or counts[s] == 0:
            if counts[s] > 0 and (f[s] + step) >= 1:
                f[s] += step
                diff -= step
        i += 1
    return f


def rans_encode(data: np.ndarray, K: int = K_DEFAULT) -> bytes:
    """Per-read table embedded in the stream."""
    d = np.asarray(data, dtype=np.uint8)
    counts = np.bincount(d, minlength=256)
    freqs = normalize_freqs(counts)
    present = freqs > 0
    header = np.packbits(present.astype(np.uint8), bitorder="little").tobytes()
    # store f-1 so the degenerate single-symbol histogram (f == M) fits
    header += pack_bits(freqs[present] - 1, PROB_BITS)
    return header + rans_encode_static(d, freqs, K)


def rans_encode_static(data: np.ndarray, freqs: np.ndarray, K: int = K_DEFAULT) -> bytes:
    """Body only — caller supplies the (shared/canned) normalized table."""
    d = np.asarray(data, dtype=np.uint8)
    n = d.size
    freqs = np.asarray(freqs, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(freqs)])[:256]

    f_of = freqs[d].astype(np.uint64)
    c_of = cum[d].astype(np.uint64)
    nsteps = -(-n // K) if n else 0
    states = np.full(K, RANS_L, dtype=np.uint64)
    # per-lane output buffers (bytes emitted in reverse encode order)
    lane_n = np.zeros(K, dtype=np.int64)
    cap = 2 * nsteps + 8
    lane_buf = np.zeros((K, cap), dtype=np.uint8)
    lanes = np.arange(K)
    for t in range(nsteps - 1, -1, -1):
        idx = t * K + lanes
        active = idx < n
        ai = idx[active]
        la = lanes[active]
        f = f_of[ai]
        c = c_of[ai]
        # renormalize: emit low bytes while state too big for this freq
        x = states[la]
        ubound = f * np.uint64((RANS_L >> PROB_BITS) << 8)
        for _ in range(2):
            over = x >= ubound
            if not over.any():
                break
            lo = la[over]
            lane_buf[lo, lane_n[lo]] = (x[over] & np.uint64(0xFF)).astype(np.uint8)
            lane_n[lo] += 1
            x[over] >>= np.uint64(8)
        states[la] = (x // f << np.uint64(PROB_BITS)) + (x % f) + c
    out = []
    out.append(states.astype("<u4").tobytes())
    out.append(lane_n.astype("<u4").tobytes())
    for i in range(K):
        # reverse so decode reads forward
        out.append(lane_buf[i, : lane_n[i]][::-1].tobytes())
    return b"".join(out)


def rans_decode(stream: bytes, n: int, K: int = K_DEFAULT) -> np.ndarray:
    buf = np.frombuffer(stream, dtype=np.uint8)
    present = np.unpackbits(buf[:32], bitorder="little").astype(bool)
    npresent = int(present.sum())
    fbits_len = (npresent * PROB_BITS + 7) // 8
    off = 32
    fvals = unpack_bits(
        buf[off : off + fbits_len].tobytes(), PROB_BITS, npresent, np.uint32
    )
    off += fbits_len
    freqs = np.zeros(256, dtype=np.int64)
    freqs[present] = fvals.astype(np.int64) + 1
    return rans_decode_static(stream[off:], n, freqs, K)


def rans_decode_static(stream: bytes, n: int, freqs: np.ndarray,
                       K: int = K_DEFAULT) -> np.ndarray:
    buf = np.frombuffer(stream, dtype=np.uint8)
    freqs = np.asarray(freqs, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(freqs)])[:256]
    # slot -> symbol LUT
    slot_sym = np.repeat(np.arange(256, dtype=np.uint8), freqs)
    off = 0
    states = (
        np.frombuffer(stream, dtype="<u4", count=K, offset=off)
        .astype(np.uint64)
        .copy()
    )
    off += 4 * K
    lane_n = np.frombuffer(stream, dtype="<u4", count=K, offset=off).astype(np.int64)
    off += 4 * K
    lane_ptr = np.zeros(K, dtype=np.int64)
    lane_start = off + np.concatenate([[0], np.cumsum(lane_n)])[:K]
    freqs_u = freqs.astype(np.uint64)
    cum_u = cum.astype(np.uint64)
    out = np.empty(n, dtype=np.uint8)
    lanes = np.arange(K)
    nsteps = -(-n // K) if n else 0
    for t in range(nsteps):
        idx = t * K + lanes
        active = idx < n
        la = lanes[active]
        x = states[la]
        slot = x & np.uint64(M - 1)
        sym = slot_sym[slot]
        out[idx[active]] = sym
        x = freqs_u[sym] * (x >> np.uint64(PROB_BITS)) + slot - cum_u[sym]
        for _ in range(2):
            under = x < np.uint64(RANS_L)
            if not under.any():
                break
            lu = la[under]
            b = buf[lane_start[lu] + lane_ptr[lu]].astype(np.uint64)
            lane_ptr[lu] += 1
            x[under] = (x[under] << np.uint64(8)) | b
        states[la] = x
    return out


def rans_bound(n: int, K: int = K_DEFAULT) -> int:
    return 32 + 384 + 8 * K + 2 * n + 64


# ---------------------------------------------------------------------------
# shared-stream interleaved rANS (format v2 — the srans flagship body)
# ---------------------------------------------------------------------------
#
# Layout: [K states u32 LE][shared byte stream].  No per-lane lengths: all
# lanes emit into ONE stream in exactly the order the decoder consumes —
# per decode step, round-1 refill bytes for lanes 0..K-1 (ascending), then
# round-2 bytes.  This makes the per-step byte group contiguous, which is
# what lets the TPU decoder fetch one window per read per step instead of
# doing K scattered lane reads (the ryg_rans SIMD interleaving, cf.
# PAPERS.md "RAS: A Bit-Exact rANS Accelerator").

K_SHARED = 32


def rans_encode_shared(data: np.ndarray, freqs: np.ndarray,
                       K: int = K_SHARED) -> bytes:
    """Encode bytes with a caller-supplied normalized table (sum == M)."""
    d = np.asarray(data, dtype=np.uint8)
    n = d.size
    freqs = np.asarray(freqs, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(freqs)])[:256]
    f_all = freqs[d].astype(np.uint64) if n else np.zeros(0, np.uint64)
    c_all = cum[d].astype(np.uint64) if n else np.zeros(0, np.uint64)
    nsteps = -(-n // K) if n else 0
    states = np.full(K, RANS_L, dtype=np.uint64)
    lanes = np.arange(K)
    groups = []
    for t in range(nsteps - 1, -1, -1):
        idx = t * K + lanes
        active = idx < n
        ai = np.minimum(idx, n - 1)
        f = np.where(active, f_all[ai], 1)
        c = np.where(active, c_all[ai], 0)
        x = states.copy()
        ubound = f * np.uint64((RANS_L >> PROB_BITS) << 8)
        b1 = (x & np.uint64(0xFF)).astype(np.uint8)
        over1 = active & (x >= ubound)
        x = np.where(over1, x >> np.uint64(8), x)
        b2 = (x & np.uint64(0xFF)).astype(np.uint8)
        over2 = active & (x >= ubound)
        x = np.where(over2, x >> np.uint64(8), x)
        states = np.where(
            active, (x // f << np.uint64(PROB_BITS)) + (x % f) + c, x
        )
        round1 = np.where(over2, b2, b1)[over1]
        round2 = b1[over2]
        groups.append(round1.tobytes() + round2.tobytes())
    groups.reverse()
    return states.astype("<u4").tobytes() + b"".join(groups)


def rans_decode_shared(stream: bytes, n: int, freqs: np.ndarray,
                       K: int = K_SHARED) -> np.ndarray:
    buf = np.frombuffer(stream, dtype=np.uint8)
    freqs = np.asarray(freqs, dtype=np.int64)
    cum = np.concatenate([[0], np.cumsum(freqs)])[:256]
    slot_sym = np.repeat(np.arange(256, dtype=np.uint8), freqs)
    states = (
        np.frombuffer(stream, dtype="<u4", count=K).astype(np.uint64).copy()
    )
    ptr = 4 * K
    freqs_u = freqs.astype(np.uint64)
    cum_u = cum.astype(np.uint64)
    out = np.empty(n, dtype=np.uint8)
    lanes = np.arange(K)
    nsteps = -(-n // K) if n else 0
    for t in range(nsteps):
        idx = t * K + lanes
        active = idx < n
        x = states
        slot = x & np.uint64(M - 1)
        sym = slot_sym[slot]
        out[idx[active]] = sym[active]
        x = np.where(
            active, freqs_u[sym] * (x >> np.uint64(PROB_BITS)) + slot - cum_u[sym], x
        )
        for _ in range(2):
            under = active & (x < np.uint64(RANS_L))
            cnt = int(under.sum())
            if cnt:
                b = buf[ptr : ptr + cnt].astype(np.uint64)
                x[under] = (x[under] << np.uint64(8)) | b
                ptr += cnt
        states = x
    return out
