"""Batched entropy stages: static-Huffman encode and static-CDF rANS.

shuff encode: per-byte code length LUT -> bit-offset prefix sum ->
LSB-first bit scatter (the TPU shape of press/huffman do_memory_encode).

rANS: K independent lanes per read; encode walks steps in reverse with
masked byte emission, decode mirrors forward — symbols decode K-per-step
per read, B*K-parallel across the batch.  Wire format matches
honours_tpu.kernels.rans.rans_{en,de}code_static byte-for-byte.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.bits import rowwise_concat, scatter_bits_lsb, u32be_bytes
from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L, K_DEFAULT

# ---------------------------------------------------------------------------
# static Huffman encode
# ---------------------------------------------------------------------------


def shuff_encode_batch(data: jnp.ndarray, dlen: jnp.ndarray, lengths, codes):
    """[B, N] u8 + valid lengths -> shuffman blob [dataBytes:u32 BE][bits].

    lengths/codes: 256-entry device arrays of the canned table.
    """
    B, N = data.shape
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = pos < dlen[:, None]
    d = data.astype(jnp.int32)
    lens = jnp.where(valid, lengths[d], 0)
    ends = jnp.cumsum(lens, axis=1)
    offs = ends - lens
    total_bits = ends[:, -1]
    n_words = (2 * N + 8 + 3) // 4  # max 22-bit codes => < 3 bytes/symbol
    bits = scatter_bits_lsb(codes[d], lens, offs, valid, n_words)
    hdr = u32be_bytes(dlen)
    blob, blen = rowwise_concat(
        [(hdr, jnp.full((B,), 4, jnp.int32)), (bits, (total_bits + 7) // 8)],
        4 * n_words + 4,
    )
    return blob, blen


# ---------------------------------------------------------------------------
# static-CDF rANS
# ---------------------------------------------------------------------------


def _lane_grid(B, K):
    return jnp.arange(B, dtype=jnp.int32)[:, None], jnp.arange(K, dtype=jnp.int32)[
        None, :
    ]


@functools.partial(jax.jit, static_argnames=("K",))
def rans_encode_batch(data, dlen, freqs, cum, K: int = K_DEFAULT):
    """[B, N] u8 -> (stream [B, M] u8, stream_len [B]).

    Format: [K states u32 LE][K lane lens u32 LE][lane bytes, reversed].
    The loop carries only dense per-step buffers (dynamic_update_slice,
    no scatter), and lane compaction happens once post-loop via a
    binary-search gather — the scatter-free formulation TPUs like.
    """
    B, N = data.shape
    nsteps = -(-N // K)
    S = 2 * nsteps  # emission slots
    d = data.astype(jnp.int32)
    f_of = freqs[d].astype(jnp.uint32)  # [B, N]
    c_of = cum[d].astype(jnp.uint32)
    rows, lanes = _lane_grid(B, K)

    def body(i, carry):
        states, vals, flags = carry
        t = nsteps - 1 - i
        idx = jnp.broadcast_to(t * K + lanes, (B, K))
        active = idx < dlen[:, None]
        ai = jnp.clip(idx, 0, N - 1)
        f = jnp.where(active, jnp.take_along_axis(f_of, ai, axis=1), 1)
        c = jnp.where(active, jnp.take_along_axis(c_of, ai, axis=1), 0)
        x = states
        ubound = f * jnp.uint32((RANS_L >> PROB_BITS) << 8)
        over1 = active & (x >= ubound)
        b1 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        x = jnp.where(over1, x >> jnp.uint32(8), x)
        over2 = active & (x >= ubound)
        b2 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        x = jnp.where(over2, x >> jnp.uint32(8), x)
        newx = (x // f << jnp.uint32(PROB_BITS)) + (x % f) + c
        states = jnp.where(active, newx, x)
        vals = jax.lax.dynamic_update_slice(
            vals, jnp.stack([b1, b2]), (2 * i, 0, 0)
        )
        flags = jax.lax.dynamic_update_slice(
            flags, jnp.stack([over1, over2]), (2 * i, 0, 0)
        )
        return states, vals, flags

    states = jnp.full((B, K), RANS_L, dtype=jnp.uint32)
    vals = jnp.zeros((S, B, K), dtype=jnp.uint8)
    flags = jnp.zeros((S, B, K), dtype=bool)
    states, vals, flags = jax.lax.fori_loop(0, nsteps, body, (states, vals, flags))

    # per-lane compaction + reversal: output byte p of lane = emission
    # lane_n-1-p; its slot via binary search over the flag prefix sums
    vals = jnp.transpose(vals, (1, 2, 0))  # [B, K, S]
    flags = jnp.transpose(flags, (1, 2, 0)).astype(jnp.int32)
    ends = jnp.cumsum(flags, axis=2)
    lane_n = ends[:, :, -1]
    cap = S
    p = jnp.arange(cap, dtype=jnp.int32)
    want = lane_n[:, :, None] - 1 - p[None, None, :]  # emission index, desc
    want = jnp.clip(want, 0, cap - 1)
    # emission index q lives in the slot s with ends[s] >= q+1 (flags[s]=1)
    slot = jax.vmap(jax.vmap(lambda e, q: jnp.searchsorted(e, q, side="left")))(
        ends, want + 1
    )
    lane_bytes = jnp.take_along_axis(vals, jnp.clip(slot, 0, cap - 1), axis=2)

    def u32le_grid(x):  # [B, K] -> [B, 4K] u8
        shifts = jnp.array([0, 8, 16, 24], jnp.uint32).reshape(1, 1, 4)
        return (
            ((x.astype(jnp.uint32)[:, :, None] >> shifts) & jnp.uint32(0xFF))
            .astype(jnp.uint8)
            .reshape(B, 4 * K)
        )

    segments = [
        (u32le_grid(states), jnp.full((B,), 4 * K, jnp.int32)),
        (u32le_grid(lane_n), jnp.full((B,), 4 * K, jnp.int32)),
    ]
    for k in range(K):
        segments.append((lane_bytes[:, k, :], lane_n[:, k]))
    total = 8 * K + K * cap
    return rowwise_concat(segments, total)


@functools.partial(jax.jit, static_argnames=("K", "N"))
def rans_decode_batch(stream, base_off, dlen, freqs, cum, slot_sym_shared,
                      N: int, K: int = K_DEFAULT):
    """Decode [B] streams starting at base_off -> data [B, N] u8."""
    B, Mb = stream.shape
    rows, lanes = _lane_grid(B, K)

    def rd_u32(off):  # off [B, K] byte offsets -> u32
        def b(i):
            return jnp.take_along_axis(
                stream, jnp.clip(off + i, 0, Mb - 1), axis=1
            ).astype(jnp.uint32)

        return b(0) | (b(1) << 8) | (b(2) << 16) | (b(3) << 24)

    state_off = base_off[:, None] + 4 * jnp.broadcast_to(lanes, (B, K))
    states = rd_u32(state_off)
    lane_n = rd_u32(state_off + 4 * K).astype(jnp.int32)
    lane_start = (
        base_off[:, None]
        + 8 * K
        + jnp.concatenate(
            [jnp.zeros((B, 1), jnp.int32), jnp.cumsum(lane_n, axis=1)[:, :-1]], axis=1
        )
    )
    nsteps = -(-N // K)
    freqs_u = freqs.astype(jnp.uint32)
    cum_u = cum.astype(jnp.uint32)

    def body(t, carry):
        states, lane_ptr, out = carry
        idx = jnp.broadcast_to(t * K + lanes, (B, K))
        active = idx < dlen[:, None]
        x = states
        slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
        sym = slot_sym_shared[slot]
        out = jax.lax.dynamic_update_slice(
            out, sym.astype(jnp.uint8)[None], (t, 0, 0)
        )
        f = freqs_u[sym]
        c = cum_u[sym]
        newx = f * (x >> jnp.uint32(PROB_BITS)) + slot.astype(jnp.uint32) - c
        x = jnp.where(active, newx, x)
        for _ in range(2):
            under = active & (x < jnp.uint32(RANS_L))
            bidx = jnp.clip(lane_start + lane_ptr, 0, Mb - 1)
            b = jnp.take_along_axis(stream, bidx, axis=1).astype(jnp.uint32)
            x = jnp.where(under, (x << jnp.uint32(8)) | b, x)
            lane_ptr = lane_ptr + under.astype(jnp.int32)
        return x, lane_ptr, out

    out = jnp.zeros((nsteps, B, K), dtype=jnp.uint8)
    lane_ptr = jnp.zeros((B, K), dtype=jnp.int32)
    states, lane_ptr, out = jax.lax.fori_loop(0, nsteps, body, (states, lane_ptr, out))
    out = jnp.transpose(out, (1, 0, 2)).reshape(B, nsteps * K)
    return out[:, :N]


def make_tables(freqs_np: np.ndarray):
    """Device tables for the canned CDF: (freqs, cum, slot_sym)."""
    freqs_np = np.asarray(freqs_np, dtype=np.int64)
    cum_np = np.concatenate([[0], np.cumsum(freqs_np)])[:256]
    slot_sym = np.repeat(np.arange(256, dtype=np.int32), freqs_np)
    return (
        jnp.asarray(freqs_np, jnp.int32),
        jnp.asarray(cum_np, jnp.int32),
        jnp.asarray(slot_sym, jnp.int32),
    )
