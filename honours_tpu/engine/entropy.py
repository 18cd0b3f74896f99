"""Batched entropy stages: static-Huffman encode and shared-stream rANS.

shuff encode: per-byte code length LUT -> bit-offset prefix sum ->
LSB-first bit scatter (the TPU shape of press/huffman do_memory_encode).

rANS (format v2, kernels/rans.py shared-stream layout): K interleaved
lanes per read emit into ONE stream in decoder consumption order, so the
per-step byte group is contiguous.  Encode walks steps in reverse
collecting per-step candidate groups, then packs them with one monotone
compaction — no scatter, no searchsorted.  Symbol table lookups run as
256-wide compare-select sums against the CDF (XLA gather is ~100M
elem/s on TPU; a compare-sum is pure VPU).  Wire format matches
kernels.rans.rans_{en,de}code_shared byte-for-byte.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.bits import pack_fields_lsb, rowwise_concat, u32be_bytes
from honours_tpu.engine.permute import monotone_compact, rowwise_shift_left
from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L, K_SHARED

U32 = jnp.uint32

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
    bits = pack_fields_lsb(codes[d], lens, offs, valid, n_words)
    hdr = u32be_bytes(dlen)
    blob, blen = rowwise_concat(
        [(hdr, jnp.full((B,), 4, jnp.int32)), (bits, (total_bits + 7) // 8)],
        4 * n_words + 4,
    )
    return blob, blen


# ---------------------------------------------------------------------------
# shared-stream static-CDF rANS (format v2)
# ---------------------------------------------------------------------------


def _cum_ext(cum):
    """[256] cum table -> [257] with the M sentinel appended."""
    return jnp.concatenate([cum.astype(jnp.int32), jnp.full((1,), M, jnp.int32)])


def _u32le_grid_states(x, B, K):
    """[B, K] states -> [B, 4K] u8 little-endian."""
    shifts = jnp.array([0, 8, 16, 24], U32).reshape(1, 1, 4)
    return (
        ((x.astype(U32)[:, :, None] >> shifts) & jnp.uint32(0xFF))
        .astype(jnp.uint8)
        .reshape(B, 4 * K)
    )


def _lut256(d, table):
    """table[d] for d [B, K] in [0,256) and table [256, C] f32-exact values.

    Two-level 16x16 one-hot select: the l-contraction is an MXU matmul,
    so per-element VPU work is ~2x16 compares instead of 256.
    """
    C = table.shape[1]
    T = table.astype(jnp.float32).reshape(16, 16, C)  # [hi, lo, C]
    i16 = jnp.arange(16, dtype=jnp.int32)
    oh_lo = ((d & 15)[:, :, None] == i16[None, None, :]).astype(jnp.float32)
    # HIGHEST precision: table values exceed 2^8, TPU default matmul
    # precision is bf16 and would round them
    inner = jnp.einsum(
        "bkl,hlc->bkhc", oh_lo, T, precision=jax.lax.Precision.HIGHEST
    )
    oh_hi = ((d >> 4)[:, :, None] == i16[None, None, :]).astype(jnp.float32)
    return jnp.einsum(
        "bkh,bkhc->bkc", oh_hi, inner, precision=jax.lax.Precision.HIGHEST
    )


def _lookup_fc(d_step, cum_ext):
    """f, c for byte symbols [B, K] without gather (two-level select)."""
    c_lo = cum_ext[:256].astype(jnp.float32)
    c_hi = cum_ext[1:257].astype(jnp.float32)
    fc = _lut256(d_step, jnp.stack([c_hi - c_lo, c_lo], axis=1))
    return fc[:, :, 0].astype(jnp.int32), fc[:, :, 1].astype(jnp.int32)


def _divmod_smallf(x, f):
    """floor(x/f), x%f for x uint32 < 2^31 and f int32 in [1, M].

    Two-step base-2^PROB_BITS long division through exact f32 divisions
    (each operand < 2^24), one off-by-one correction per step — TPU has
    no fast integer divide by a vector.
    """
    ff = f.astype(jnp.float32)
    xh = (x >> jnp.uint32(PROB_BITS)).astype(jnp.int32)  # < 2^19
    qh = jnp.floor(xh.astype(jnp.float32) / ff).astype(jnp.int32)
    rh = xh - qh * f
    qh = qh + (rh >= f).astype(jnp.int32) - (rh < 0).astype(jnp.int32)
    rh = rh - jnp.where(rh >= f, f, 0) + jnp.where(rh < 0, f, 0)
    v = rh * M + (x & jnp.uint32(M - 1)).astype(jnp.int32)  # < 2^24
    ql = jnp.floor(v.astype(jnp.float32) / ff).astype(jnp.int32)
    r = v - ql * f
    ql = ql + (r >= f).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    r = r - jnp.where(r >= f, f, 0) + jnp.where(r < 0, f, 0)
    q = qh * M + ql
    return q.astype(U32), r.astype(U32)


@functools.partial(jax.jit, static_argnames=("K",))
def rans_encode_batch(data, dlen, freqs, cum, K: int = K_SHARED):
    """[B, N] u8 -> (stream [B, M] u8, stream_len [B]).

    Format v2: [K states u32 LE][shared body, decoder consumption order].
    """
    B, N = data.shape
    nsteps = -(-N // K)
    Np = nsteps * K
    d = jnp.pad(data.astype(jnp.int32), ((0, 0), (0, Np - N)))

    if jax.default_backend() == "tpu" and B % 8 == 0:
        # Pallas route: precompute f/cum per element with the lookup
        # kernel (single-row degenerate "clustered" table), then run the
        # state walk in one Mosaic kernel instead of an XLA while loop.
        from honours_tpu.engine.rans_encode_pallas import (
            rans_encode_core_pallas,
        )
        from honours_tpu.engine.rans_o1_pallas import o1_fc_gather_pallas

        # degenerate single-cluster table: cmap all-zero, fc rows 0..1
        fc_row = freqs.astype(jnp.int32) + cum.astype(jnp.int32) * 8192
        fc_tab = jnp.zeros((128, 128), jnp.int32).at[:2, :].set(
            fc_row.reshape(2, 128)
        )
        cmap0 = jnp.zeros((3, 128), jnp.int32)
        fc_all = o1_fc_gather_pallas(d, d, cmap0, fc_tab)
        pos = jnp.arange(Np, dtype=jnp.int32)[None, :]
        fc = jnp.where(pos < dlen[:, None], fc_all, 0)
        plane, states_i = rans_encode_core_pallas(fc, nsteps, K)
        body_bytes, body_len = monotone_compact(
            (plane & 255).astype(jnp.uint8), (plane >> 8) == 1
        )
        stream = jnp.concatenate(
            [_u32le_grid_states(states_i, B, K), body_bytes], axis=1
        )
        return stream, 4 * K + body_len

    cume = _cum_ext(cum)
    lanes = jnp.arange(K, dtype=jnp.int32)[None, :]

    def body(i, carry):
        states, groups, flags = carry
        t = nsteps - 1 - i
        d_t = jax.lax.dynamic_slice(d, (0, t * K), (B, K))
        active = (t * K + lanes) < dlen[:, None]
        f, c = _lookup_fc(d_t, cume)
        f = jnp.where(active, f, 1)
        c = jnp.where(active, c, 0)
        x = states
        ubound = f.astype(U32) * jnp.uint32((RANS_L >> PROB_BITS) << 8)
        b1 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        over1 = active & (x >= ubound)
        x = jnp.where(over1, x >> jnp.uint32(8), x)
        b2 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        over2 = active & (x >= ubound)
        x = jnp.where(over2, x >> jnp.uint32(8), x)
        q, r = _divmod_smallf(x, f)
        newx = (q << jnp.uint32(PROB_BITS)) + r + c.astype(U32)
        states = jnp.where(active, newx, x)
        g = jnp.concatenate([jnp.where(over2, b2, b1), b1], axis=1)  # [B, 2K]
        fl = jnp.concatenate([over1, over2], axis=1)
        groups = jax.lax.dynamic_update_slice(groups, g[None], (t, 0, 0))
        flags = jax.lax.dynamic_update_slice(flags, fl[None], (t, 0, 0))
        return states, groups, flags

    states = jnp.full((B, K), RANS_L, dtype=U32)
    groups = jnp.zeros((nsteps, B, 2 * K), dtype=jnp.uint8)
    flags = jnp.zeros((nsteps, B, 2 * K), dtype=bool)
    states, groups, flags = jax.lax.fori_loop(0, nsteps, body, (states, groups, flags))

    cand = jnp.transpose(groups, (1, 0, 2)).reshape(B, nsteps * 2 * K)
    keep = jnp.transpose(flags, (1, 0, 2)).reshape(B, nsteps * 2 * K)
    body_bytes, body_len = monotone_compact(cand, keep)

    def u32le_grid(x):  # [B, K] -> [B, 4K] u8
        shifts = jnp.array([0, 8, 16, 24], U32).reshape(1, 1, 4)
        return (
            ((x.astype(U32)[:, :, None] >> shifts) & jnp.uint32(0xFF))
            .astype(jnp.uint8)
            .reshape(B, 4 * K)
        )

    stream = jnp.concatenate([u32le_grid(states), body_bytes], axis=1)
    return stream, 4 * K + body_len


def _decode_symbol(x, cume):
    """slot -> (sym, f, c) via hierarchical 16+16 range search (no gather).

    Coarse bucket over cum[0::16], fine row fetched with an MXU one-hot
    matmul, then f/c through the same two-level LUT.
    """
    slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
    cumf = cume[:256].astype(jnp.float32).reshape(16, 16)
    slot_f = slot.astype(jnp.float32)
    coarse = cumf[:, 0][None, None, :]  # cum[16h]
    h = jnp.sum((slot_f[:, :, None] >= coarse).astype(jnp.int32), axis=-1) - 1
    i16 = jnp.arange(16, dtype=jnp.int32)
    oh_h = (h[:, :, None] == i16[None, None, :]).astype(jnp.float32)
    fine = jnp.einsum(
        "bkh,hl->bkl", oh_h, cumf, precision=jax.lax.Precision.HIGHEST
    )
    sym = 16 * h + jnp.sum(
        (slot_f[:, :, None] >= fine).astype(jnp.int32), axis=-1
    ) - 1
    c_lo = cume[:256].astype(jnp.float32)
    c_hi = cume[1:257].astype(jnp.float32)
    fc = _lut256(sym, jnp.stack([c_hi - c_lo, c_lo], axis=1))
    return sym, fc[:, :, 0].astype(jnp.int32), fc[:, :, 1].astype(jnp.int32), slot


@functools.partial(jax.jit, static_argnames=("N", "K"))
def rans_decode_batch(stream, base_off, dlen, freqs, cum, N: int,
                      K: int = K_SHARED):
    """Decode [B] v2 streams starting at base_off -> data [B, N] u8.

    Pure-XLA reference path (per-step byte gather); the TPU hot path is
    engine/rans_pallas.py, which this matches byte-for-byte.
    """
    B, Mb = stream.shape
    lanes = jnp.arange(K, dtype=jnp.int32)[None, :]

    def rd_u32(off):  # off [B, K] byte offsets -> u32
        def b(i):
            return jnp.take_along_axis(
                stream, jnp.clip(off + i, 0, Mb - 1), axis=1
            ).astype(U32)

        return b(0) | (b(1) << 8) | (b(2) << 16) | (b(3) << 24)

    state_off = base_off[:, None] + 4 * jnp.broadcast_to(lanes, (B, K))
    states = rd_u32(state_off)
    cume = _cum_ext(cum)

    if jax.default_backend() == "tpu":
        from honours_tpu.engine.rans_o1_pallas import (
            R,
            pick_dec_rows,
            rans_decode_shared_pallas,
        )

        rows = pick_dec_rows(B, N, Mb)
        if rows and B % rows == 0:
            # whole stream goes in; the kernel windows start at the
            # per-row body offset (no rowwise alignment shift needed)
            return rans_decode_shared_pallas(
                stream, states.astype(jnp.int32), dlen, cume, N, K,
                rows=rows, body_off=base_off + 4 * K,
            )

    body = rowwise_shift_left(stream, base_off + 4 * K, Mb)

    nsteps = -(-N // K)

    def body_fn(t, carry):
        states, ptr, out = carry
        active = (t * K + lanes) < dlen[:, None]
        x = states
        sym, f, c, slot = _decode_symbol(x, cume)
        out = jax.lax.dynamic_update_slice(
            out, sym.astype(jnp.uint8)[None], (t, 0, 0)
        )
        newx = f.astype(U32) * (x >> jnp.uint32(PROB_BITS)) + slot.astype(
            U32
        ) - c.astype(U32)
        x = jnp.where(active, newx, x)
        for _ in range(2):
            under = active & (x < jnp.uint32(RANS_L))
            rank = jnp.cumsum(under.astype(jnp.int32), axis=1) - under.astype(
                jnp.int32
            )
            bidx = jnp.clip(ptr[:, None] + rank, 0, Mb - 1)
            b = jnp.take_along_axis(body, bidx, axis=1).astype(U32)
            x = jnp.where(under, (x << jnp.uint32(8)) | b, x)
            ptr = ptr + under.sum(axis=1).astype(jnp.int32)
        return x, ptr, out

    out = jnp.zeros((nsteps, B, K), dtype=jnp.uint8)
    ptr = jnp.zeros((B,), dtype=jnp.int32)
    states, ptr, out = jax.lax.fori_loop(0, nsteps, body_fn, (states, ptr, out))
    out = jnp.transpose(out, (1, 0, 2)).reshape(B, nsteps * K)
    return out[:, :N]


def make_tables(freqs_np: np.ndarray):
    """Device tables for the canned CDF: (freqs, cum)."""
    freqs_np = np.asarray(freqs_np, dtype=np.int64)
    cum_np = np.concatenate([[0], np.cumsum(freqs_np)])[:256]
    return jnp.asarray(freqs_np, jnp.int32), jnp.asarray(cum_np, jnp.int32)