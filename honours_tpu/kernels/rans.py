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


# ---------------------------------------------------------------------------
# order-1 shared-stream rANS (format v3 — the srans2 flagship body)
# ---------------------------------------------------------------------------
#
# Block-interleaved lanes: lane k owns the contiguous slice
# [k*S, (k+1)*S) of the byte stream, so the order-1 context of every
# symbol (its predecessor byte) lives in the SAME lane one step earlier
# — all K contexts are available in lockstep during decode.  The first
# symbol of each lane slice uses the virtual context 256 (the marginal
# row of the table).  This is the TPU-parallel answer to the reference's
# serial adaptive order-1/context-mixing coders (rccsenc/rcmsenc,
# press/Turbo-Range-Coder/turborc.h:48,75): conditioning is kept, but
# the model is a canned 257x256 CDF table so decode stays lane-parallel.
#
# Wire format v3:
#   [S:u32 LE][K states u32 LE][shared body, decoder consumption order]
# Body byte order per decode step: round-1 refill bytes for lanes
# 0..K-1 ascending, then round-2 bytes (same discipline as v2).

CTX0 = 256  # virtual context of each lane's first symbol


def o1_cum(freq_tab: np.ndarray) -> np.ndarray:
    """[257, 256] freq rows (each sums to M) -> [257, 256] cum-low rows."""
    freq_tab = np.asarray(freq_tab, dtype=np.int64)
    return np.concatenate(
        [np.zeros((freq_tab.shape[0], 1), np.int64),
         np.cumsum(freq_tab, axis=1)[:, :-1]],
        axis=1,
    )


def rans_encode_o1(data: np.ndarray, freq_tab: np.ndarray,
                   K: int = K_SHARED, S: int = None) -> bytes:
    """Encode bytes with a canned order-1 table [257, 256] (rows sum to M,
    every cell >= 1; row 256 = marginal for lane-first symbols)."""
    d = np.asarray(data, dtype=np.uint8)
    n = d.size
    freq_tab = np.asarray(freq_tab, dtype=np.int64)
    cum_tab = o1_cum(freq_tab)
    if S is None:
        S = -(-n // K) if n else 0
    Np = K * S
    dp = np.zeros(Np, dtype=np.int64)
    dp[:n] = d
    grid = dp.reshape(K, S) if S else dp.reshape(K, 0)
    ctx = np.full((K, S), CTX0, dtype=np.int64)
    if S > 1:
        ctx[:, 1:] = grid[:, :-1]
    lanes = np.arange(K)
    states = np.full(K, RANS_L, dtype=np.uint64)
    groups = []
    for t in range(S - 1, -1, -1):
        active = (lanes * S + t) < n
        sym = grid[:, t]
        f = np.where(active, freq_tab[ctx[:, t], sym], 1).astype(np.uint64)
        c = np.where(active, cum_tab[ctx[:, t], sym], 0).astype(np.uint64)
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
    return (
        np.uint32(S).tobytes()
        + states.astype("<u4").tobytes()
        + b"".join(groups)
    )


def rans_decode_o1(stream: bytes, n: int, freq_tab: np.ndarray,
                   K: int = K_SHARED) -> np.ndarray:
    buf = np.frombuffer(stream, dtype=np.uint8)
    freq_tab = np.asarray(freq_tab, dtype=np.int64)
    cum_tab = o1_cum(freq_tab)
    # slot -> symbol LUT per context row
    slot_sym = np.zeros((freq_tab.shape[0], M), dtype=np.uint8)
    for r in range(freq_tab.shape[0]):
        slot_sym[r] = np.repeat(np.arange(256, dtype=np.uint8), freq_tab[r])
    S = int(np.frombuffer(stream, dtype="<u4", count=1)[0])
    states = (
        np.frombuffer(stream, dtype="<u4", count=K, offset=4)
        .astype(np.uint64)
        .copy()
    )
    ptr = 4 + 4 * K
    out = np.zeros(K * S, dtype=np.uint8)
    lanes = np.arange(K)
    ctx = np.full(K, CTX0, dtype=np.int64)
    for t in range(S):
        active = (lanes * S + t) < n
        x = states
        slot = (x & np.uint64(M - 1)).astype(np.int64)
        sym = slot_sym[ctx, slot].astype(np.int64)
        out[lanes * S + t] = np.where(active, sym, 0)
        x = np.where(
            active,
            freq_tab[ctx, sym].astype(np.uint64) * (x >> np.uint64(PROB_BITS))
            + slot.astype(np.uint64)
            - cum_tab[ctx, sym].astype(np.uint64),
            x,
        )
        for _ in range(2):
            under = active & (x < np.uint64(RANS_L))
            cnt = int(under.sum())
            if cnt:
                b = buf[ptr : ptr + cnt].astype(np.uint64)
                x[under] = (x[under] << np.uint64(8)) | b
                ptr += cnt
        states = x
        ctx = np.where(active, sym, ctx)
    return out[:n]


# ---------------------------------------------------------------------------
# nibble-factorized order-1 rANS (format v4 — the srans3 flagship body)
# ---------------------------------------------------------------------------
#
# Each byte codes as TWO 4-bit symbols: hi conditioned on the byte-level
# context cluster (the SAME clustering as the o1 table), lo conditioned
# on (cluster, hi) pairs clustered to rL rows.  The factorization
# P(b|cl) = P(hi|cl) * P(lo|cl,hi) is exact, so the ratio matches the
# byte model up to lo-table quantization (+0.33% measured at rL = 64,
# tools/nibble_model_eval.py) — while the TPU decode search runs 16-wide
# instead of 256-wide.  Wire format v4:
#   [S:u32 LE][K states u32 LE][shared body]
# with v3's block-interleaved lanes; byte t of a lane = steps 2t (hi)
# then 2t+1 (lo); per-step refill discipline identical to v2/v3.


def rans_encode_o1n(data: np.ndarray, tabs: dict, K: int = K_SHARED,
                    S: int = None) -> bytes:
    """Encode bytes with nibble tables from tables.o1n.nibble_tables()."""
    d = np.asarray(data, dtype=np.uint8)
    n = d.size
    H = np.asarray(tabs["H"], np.int64)           # [r, 16]
    L = np.asarray(tabs["L"], np.int64)           # [rL, 16]
    cmap = np.asarray(tabs["cmap"], np.int64)     # [257] byte ctx -> cl
    lo_assign = np.asarray(tabs["lo_assign"], np.int64)  # [r*16] -> gl
    cumH = np.concatenate([np.zeros((H.shape[0], 1), np.int64),
                           np.cumsum(H, axis=1)[:, :-1]], axis=1)
    cumL = np.concatenate([np.zeros((L.shape[0], 1), np.int64),
                           np.cumsum(L, axis=1)[:, :-1]], axis=1)
    if S is None:
        S = -(-n // K) if n else 0
    Np = K * S
    dp = np.zeros(Np, dtype=np.int64)
    dp[:n] = d
    grid = dp.reshape(K, S) if S else dp.reshape(K, 0)
    ctx = np.full((K, S), CTX0, dtype=np.int64)
    if S > 1:
        ctx[:, 1:] = grid[:, :-1]
    lanes = np.arange(K)
    states = np.full(K, RANS_L, dtype=np.uint64)
    groups = []
    for t in range(S - 1, -1, -1):
        active = (lanes * S + t) < n
        cl = cmap[ctx[:, t]]
        hi, lo = grid[:, t] >> 4, grid[:, t] & 15
        gl = lo_assign[cl * 16 + hi]
        for f_all, c_all in (
            (L[gl, lo], cumL[gl, lo]),       # lo first (reverse order)
            (H[cl, hi], cumH[cl, hi]),
        ):
            f = np.where(active, f_all, 1).astype(np.uint64)
            c = np.where(active, c_all, 0).astype(np.uint64)
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
    return (
        np.uint32(S).tobytes()
        + states.astype("<u4").tobytes()
        + b"".join(groups)
    )


def rans_decode_o1n(stream: bytes, n: int, tabs: dict,
                    K: int = K_SHARED) -> np.ndarray:
    buf = np.frombuffer(stream, dtype=np.uint8)
    H = np.asarray(tabs["H"], np.int64)
    L = np.asarray(tabs["L"], np.int64)
    cmap = np.asarray(tabs["cmap"], np.int64)
    lo_assign = np.asarray(tabs["lo_assign"], np.int64)
    cumH = np.concatenate([np.zeros((H.shape[0], 1), np.int64),
                           np.cumsum(H, axis=1)[:, :-1]], axis=1)
    cumL = np.concatenate([np.zeros((L.shape[0], 1), np.int64),
                           np.cumsum(L, axis=1)[:, :-1]], axis=1)
    slot_h = np.zeros((H.shape[0], M), dtype=np.int64)
    for j in range(H.shape[0]):
        slot_h[j] = np.repeat(np.arange(16), H[j])
    slot_l = np.zeros((L.shape[0], M), dtype=np.int64)
    for j in range(L.shape[0]):
        slot_l[j] = np.repeat(np.arange(16), L[j])
    S = int(np.frombuffer(stream, dtype="<u4", count=1)[0])
    states = (
        np.frombuffer(stream, dtype="<u4", count=K, offset=4)
        .astype(np.uint64).copy()
    )
    ptr = 4 + 4 * K
    out = np.zeros(K * S, dtype=np.uint8)
    lanes = np.arange(K)
    cl = np.full(K, 0, dtype=np.int64)
    cl[:] = cmap[CTX0]
    for t in range(S):
        active = (lanes * S + t) < n
        hi = np.zeros(K, np.int64)
        for phase in (0, 1):
            x = states
            slot = (x & np.uint64(M - 1)).astype(np.int64)
            if phase == 0:
                sym = slot_h[cl, slot]
                f = H[cl, sym].astype(np.uint64)
                c = cumH[cl, sym].astype(np.uint64)
                hi = sym
            else:
                gl = lo_assign[cl * 16 + hi]
                sym = slot_l[gl, slot]
                f = L[gl, sym].astype(np.uint64)
                c = cumL[gl, sym].astype(np.uint64)
                byte = hi * 16 + sym
                out[lanes * S + t] = np.where(active, byte, 0)
                cl = np.where(active, cmap[byte], cl)
            x = np.where(
                active,
                f * (x >> np.uint64(PROB_BITS))
                + slot.astype(np.uint64) - c,
                x,
            )
            for _ in range(2):
                under = active & (x < np.uint64(RANS_L))
                cnt = int(under.sum())
                if cnt:
                    b = buf[ptr : ptr + cnt].astype(np.uint64)
                    x[under] = (x[under] << np.uint64(8)) | b
                    ptr += cnt
            states = x
    return out[:n]


# ---------------------------------------------------------------------------
# dynamic order-1 rANS with mid-stream table switch (format v5 — drans)
# ---------------------------------------------------------------------------
#
# Same wire framing as v3 ([S:u32 LE][K states u32 LE][shared body]) and
# the same block-interleaved lane grid, but lane-grid steps
# t < tables.drans.prefix_steps(S) code with table A (the canned o1
# model) and steps t >= T0 with table B (fitted on the decoded prefix by
# tables.drans.fit_freqs — derivable by the decoder, so NO table bytes
# are stored).  Decode is split into start (prefix steps, table A) and
# finish (suffix steps, table B) so a batch of reads can share one fit.


def _o1_enc_steps(grid, ctx, n, states, freq_tab, cum_tab, t_hi, t_lo, S):
    """Encode steps t in [t_lo, t_hi) (walked high->low) with one table.
    Returns (states, byte-groups list in walk order)."""
    K = grid.shape[0]
    lanes = np.arange(K)
    groups = []
    for t in range(t_hi - 1, t_lo - 1, -1):
        active = (lanes * S + t) < n
        sym = grid[:, t]
        f = np.where(active, freq_tab[ctx[:, t], sym], 1).astype(np.uint64)
        c = np.where(active, cum_tab[ctx[:, t], sym], 0).astype(np.uint64)
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
    return states, groups


def o1_grid(data: np.ndarray, K: int = K_SHARED, S: int = None):
    """Lane grid + in-lane contexts for n bytes: ([K, S], [K, S], S)."""
    d = np.asarray(data, dtype=np.uint8)
    n = d.size
    if S is None:
        S = -(-n // K) if n else 0
    dp = np.zeros(K * S, dtype=np.int64)
    dp[:n] = d
    grid = dp.reshape(K, S)
    ctx = np.full((K, S), CTX0, dtype=np.int64)
    if S > 1:
        ctx[:, 1:] = grid[:, :-1]
    return grid, ctx, S


def rans_encode_o1_dyn(data: np.ndarray, freq_a: np.ndarray,
                       freq_b: np.ndarray, T0: int,
                       K: int = K_SHARED, S: int = None) -> bytes:
    """v5 encode: steps < T0 with freq_a, >= T0 with freq_b."""
    grid, ctx, S = o1_grid(data, K, S)
    n = np.asarray(data).size
    states = np.full(K, RANS_L, dtype=np.uint64)
    fa = np.asarray(freq_a, np.int64)
    fb = np.asarray(freq_b, np.int64)
    states, g_suf = _o1_enc_steps(
        grid, ctx, n, states, fb, o1_cum(fb), S, T0, S
    )
    states, g_pre = _o1_enc_steps(
        grid, ctx, n, states, fa, o1_cum(fa), T0, 0, S
    )
    groups = g_suf + g_pre
    groups.reverse()
    return (
        np.uint32(S).tobytes()
        + states.astype("<u4").tobytes()
        + b"".join(groups)
    )


def _slot_sym_lut(freq_tab: np.ndarray) -> np.ndarray:
    lut = np.zeros((freq_tab.shape[0], M), dtype=np.uint8)
    for r in range(freq_tab.shape[0]):
        lut[r] = np.repeat(np.arange(256, dtype=np.uint8), freq_tab[r])
    return lut


def _o1_dec_steps(st: dict, freq_tab: np.ndarray, t_lo: int, t_hi: int):
    """Decode steps [t_lo, t_hi) with one table, mutating st in place."""
    freq_tab = np.asarray(freq_tab, np.int64)
    cum_tab = o1_cum(freq_tab)
    slot_sym = _slot_sym_lut(freq_tab)
    buf, n, S, K = st["buf"], st["n"], st["S"], st["K"]
    states, ptr, ctx, out = st["states"], st["ptr"], st["ctx"], st["out"]
    lanes = np.arange(K)
    for t in range(t_lo, t_hi):
        active = (lanes * S + t) < n
        x = states
        slot = (x & np.uint64(M - 1)).astype(np.int64)
        sym = slot_sym[ctx, slot].astype(np.int64)
        out[lanes * S + t] = np.where(active, sym, 0)
        x = np.where(
            active,
            freq_tab[ctx, sym].astype(np.uint64) * (x >> np.uint64(PROB_BITS))
            + slot.astype(np.uint64)
            - cum_tab[ctx, sym].astype(np.uint64),
            x,
        )
        for _ in range(2):
            under = active & (x < np.uint64(RANS_L))
            cnt = int(under.sum())
            if cnt:
                b = buf[ptr : ptr + cnt].astype(np.uint64)
                x[under] = (x[under] << np.uint64(8)) | b
                ptr += cnt
        states = x
        ctx = np.where(active, sym, ctx)
    st["states"], st["ptr"], st["ctx"] = states, ptr, ctx


def o1_dyn_decode_start(stream: bytes, n: int, freq_a: np.ndarray, T0: int,
                        K: int = K_SHARED) -> dict:
    """Decode the prefix steps [0, T0) with freq_a; returns the resume
    state (st["out"] holds the decoded prefix on the lane grid)."""
    buf = np.frombuffer(stream, dtype=np.uint8)
    S = int(np.frombuffer(stream, dtype="<u4", count=1)[0])
    states = (
        np.frombuffer(stream, dtype="<u4", count=K, offset=4)
        .astype(np.uint64)
        .copy()
    )
    st = dict(
        buf=buf, n=n, S=S, K=K, states=states, ptr=4 + 4 * K,
        ctx=np.full(K, CTX0, dtype=np.int64),
        out=np.zeros(K * max(S, 1), dtype=np.uint8),
    )
    _o1_dec_steps(st, freq_a, 0, min(T0, S))
    return st


def o1_dyn_decode_finish(st: dict, freq_b: np.ndarray, T0: int) -> np.ndarray:
    """Decode the suffix steps [T0, S) with freq_b -> data [n]."""
    _o1_dec_steps(st, freq_b, min(T0, st["S"]), st["S"])
    return st["out"][: st["n"]]
