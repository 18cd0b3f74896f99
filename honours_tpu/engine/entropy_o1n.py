"""Batched nibble-factorized order-1 rANS (wire format v4) — srans3.

Same lane discipline as the v3 engine (entropy_o1.py): block-interleaved
lanes, shared refill stream, per-row S header.  Each byte codes as two
4-bit symbols, so the TPU decode search is 16-wide (engine/rans_n4_pallas
.py); the encode state walk REUSES rans_encode_core_pallas with
2*Smax steps.  Byte-exact with kernels.rans.rans_{en,de}code_o1n.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.bits import read_u32le, rowwise_concat, u32le_bytes
from honours_tpu.engine.entropy_o1 import _lane_grid, _u32le_grid, _ungrid
from honours_tpu.engine.permute import monotone_compact, rowwise_shift_left
from honours_tpu.kernels.rans import CTX0, M, PROB_BITS, RANS_L, K_SHARED

U32 = jnp.uint32


def _flat_pad(a, n_chunks: int):
    out = np.zeros(n_chunks * 128, np.int64)
    out[: a.size] = np.asarray(a, np.int64).reshape(-1)
    return jnp.asarray(out.reshape(n_chunks, 128), jnp.int32)


def make_o1n_tables(nib: dict) -> dict:
    """Device tables from tables.o1n.build_nibble_tables output."""
    H = np.asarray(nib["H"], np.int64)            # [r, 16]
    L = np.asarray(nib["L"], np.int64)            # [rL, 16]
    cmap = np.asarray(nib["cmap"], np.int64)      # [257]
    lo_assign = np.asarray(nib["lo_assign"], np.int64)  # [r*16]
    r, rL = H.shape[0], L.shape[0]
    cumH = np.concatenate(
        [np.zeros((r, 1), np.int64), np.cumsum(H, axis=1)[:, :-1]], axis=1
    )
    cumL = np.concatenate(
        [np.zeros((rL, 1), np.int64), np.cumsum(L, axis=1)[:, :-1]], axis=1
    )
    # slot -> symbol LUTs flattened for the CPU take route
    sh = np.zeros((r, M), np.int64)
    for j in range(r):
        sh[j] = np.repeat(np.arange(16), H[j])
    sl = np.zeros((rL, M), np.int64)
    for j in range(rL):
        sl[j] = np.repeat(np.arange(16), L[j])
    # 6-bit bf16-exact planes (Mosaic f32 matmuls round through bf16, so
    # raw 12-bit f32 tables are NOT exact on hardware):
    # cols [0:16] cumhi>>6, [16:32] cumhi&63, [32:48] f>>6, [48:64] f&63
    ch = np.cumsum(H, axis=1)
    cl2 = np.cumsum(L, axis=1)
    planes_h = np.concatenate([ch >> 6, ch & 63, H >> 6, H & 63], axis=1)
    planes_l = np.concatenate([cl2 >> 6, cl2 & 63, L >> 6, L & 63], axis=1)
    return dict(
        r=r, rL=rL,
        cmap_pad=_flat_pad(cmap, 3),
        lo_assign_pad=_flat_pad(lo_assign, 8),
        fcH_tab=_flat_pad(H + cumH * 8192, 8),
        fcL_tab=_flat_pad(L + cumL * 8192, 8),
        planes_h=jnp.asarray(planes_h, jnp.bfloat16),
        planes_l=jnp.asarray(planes_l, jnp.bfloat16),
        # CPU take route
        flat_cmap=jnp.asarray(cmap, jnp.int32),
        flat_lo=jnp.asarray(lo_assign, jnp.int32),
        flat_fcH=jnp.asarray((H + cumH * 8192).reshape(-1), jnp.int32),
        flat_fcL=jnp.asarray((L + cumL * 8192).reshape(-1), jnp.int32),
        flat_sh=jnp.asarray(sh.reshape(-1), jnp.int32),
        flat_sl=jnp.asarray(sl.reshape(-1), jnp.int32),
        flat_H=jnp.asarray(H.reshape(-1), jnp.int32),
        flat_L=jnp.asarray(L.reshape(-1), jnp.int32),
        flat_cumH=jnp.asarray(cumH.reshape(-1), jnp.int32),
        flat_cumL=jnp.asarray(cumL.reshape(-1), jnp.int32),
    )


def canned_o1n_device_tables():
    from honours_tpu.tables.o1n import canned_nibble_tables

    return make_o1n_tables(canned_nibble_tables())


def _fc_pair(sym, ctx, tabs):
    """Per-byte (fc_hi, fc_lo) i32 lookups, [B, G] each."""
    if jax.default_backend() == "tpu":
        from honours_tpu.engine.rans_n4_pallas import o1n_fc_gather_pallas

        return o1n_fc_gather_pallas(
            sym, ctx, tabs["cmap_pad"], tabs["lo_assign_pad"],
            tabs["fcH_tab"], tabs["fcL_tab"],
        )
    cl = jnp.take(tabs["flat_cmap"], ctx)
    hi, lo = sym >> 4, sym & 15
    fch = jnp.take(tabs["flat_fcH"], cl * 16 + hi)
    gl = jnp.take(tabs["flat_lo"], cl * 16 + hi)
    fcl = jnp.take(tabs["flat_fcL"], gl * 16 + lo)
    return fch, fcl


def _encode_core_xla(fc, nsteps: int, K: int):
    """XLA mirror of rans_encode_core_pallas (CPU tests route)."""
    from honours_tpu.engine.entropy import _divmod_smallf

    B = fc.shape[0]

    def body(i, carry):
        states, plane = carry
        t = nsteps - 1 - i
        fcs = jax.lax.dynamic_slice(fc, (0, t * K), (B, K))
        active = fcs > 0
        f = jnp.where(active, fcs & 8191, 1)
        c = jnp.where(active, fcs >> 13, 0)
        x = states
        ubound = f.astype(U32) * jnp.uint32((RANS_L >> PROB_BITS) << 8)
        b1 = x & jnp.uint32(0xFF)
        over1 = active & (x >= ubound)
        x = jnp.where(over1, x >> jnp.uint32(8), x)
        b2 = x & jnp.uint32(0xFF)
        over2 = active & (x >= ubound)
        x = jnp.where(over2, x >> jnp.uint32(8), x)
        q, rm = _divmod_smallf(x, f)
        newx = (q << jnp.uint32(PROB_BITS)) + rm + c.astype(U32)
        states = jnp.where(active, newx, x)
        chunk = jnp.concatenate(
            [
                jnp.where(over2, b2, b1).astype(jnp.int32)
                | (over1.astype(jnp.int32) << 8),
                b1.astype(jnp.int32) | (over2.astype(jnp.int32) << 8),
            ],
            axis=1,
        )
        plane = jax.lax.dynamic_update_slice(plane, chunk, (0, t * 2 * K))
        return states, plane

    states = jnp.full((B, K), RANS_L, dtype=U32)
    plane = jnp.zeros((B, nsteps * 2 * K), jnp.int32)
    states, plane = jax.lax.fori_loop(0, nsteps, body, (states, plane))
    return plane, states.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("K",))
def rans_o1n_encode_batch(data, dlen, tabs, K: int = K_SHARED):
    """[B, N] u8 + lengths -> (stream [B, Mo] u8, stream_len [B]).

    Wire format v4.  Byte-exact with kernels.rans.rans_encode_o1n.
    """
    B, N = data.shape
    Smax = -(-N // K)
    g3, ctx3, act3, S_b = _lane_grid(data, dlen, K, Smax)
    fch, fcl = _fc_pair(g3.reshape(B, -1), ctx3.reshape(B, -1), tabs)
    fch = jnp.where(act3.reshape(B, -1), fch, 0).reshape(B, K, Smax)
    fcl = jnp.where(act3.reshape(B, -1), fcl, 0).reshape(B, K, Smax)
    # step-major [B, 2*Smax*K]: column (2t + phase)*K + k
    fc4 = jnp.stack([fch, fcl], axis=3)  # [B, K, Smax, 2]
    fc = jnp.transpose(fc4, (0, 2, 3, 1)).reshape(B, 2 * Smax * K)

    if jax.default_backend() == "tpu" and B % 8 == 0:
        from honours_tpu.engine.rans_encode_pallas import (
            rans_encode_core_pallas,
        )

        plane, states_i = rans_encode_core_pallas(fc, 2 * Smax, K)
    else:
        plane, states_i = _encode_core_xla(fc, 2 * Smax, K)
    body_bytes, body_len = monotone_compact(
        (plane & 255).astype(jnp.uint8), (plane >> 8) == 1
    )
    segs = [
        (u32le_bytes(S_b), jnp.full((B,), 4, jnp.int32)),
        (_u32le_grid(states_i), jnp.full((B,), 4 * K, jnp.int32)),
        (body_bytes, body_len),
    ]
    return rowwise_concat(segs, 4 + 4 * K + body_bytes.shape[1])


@functools.partial(jax.jit, static_argnames=("N", "K"))
def rans_o1n_decode_batch(stream, base_off, dlen, tabs, N: int,
                          K: int = K_SHARED):
    """Decode [B] v4 streams at base_off -> data [B, N] u8."""
    B, Mb = stream.shape
    Smax = -(-N // K)
    lanes = jnp.arange(K, dtype=jnp.int32)[None, :]
    S_b = read_u32le(stream, base_off).astype(jnp.int32)

    def rd_u32(off):
        def b(i):
            return jnp.take_along_axis(
                stream, jnp.clip(off + i, 0, Mb - 1), axis=1
            ).astype(U32)

        return b(0) | (b(1) << 8) | (b(2) << 16) | (b(3) << 24)

    state_off = base_off[:, None] + 4 + 4 * jnp.broadcast_to(lanes, (B, K))
    states = rd_u32(state_off)
    body = rowwise_shift_left(stream, base_off + 4 + 4 * K, Mb)

    if jax.default_backend() == "tpu":
        from honours_tpu.engine.rans_n4_pallas import (
            pick_rows_n4,
            rans_n4_decode_pallas,
        )

        rows = pick_rows_n4(B, N)
        if B % rows == 0:
            cap = min(Mb, 2 * N + 256)
            grid = rans_n4_decode_pallas(
                body[:, :cap], states.astype(jnp.int32), dlen, S_b,
                tabs, Smax, K, rows=rows,
            )
            return _ungrid(grid, S_b, dlen, K, Smax, N)

    # CPU fallback: per-step take route
    def body_fn(ts, carry):
        states, ptr, cl, hi, out = carry
        t = ts >> 1
        phase = ts & 1
        active = (t < S_b[:, None]) & ((lanes * S_b[:, None] + t) < dlen[:, None])
        x = states
        slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
        sym_h = jnp.take(tabs["flat_sh"], cl * M + slot)
        gl = jnp.take(tabs["flat_lo"], cl * 16 + hi)
        sym_l = jnp.take(tabs["flat_sl"], gl * M + slot)
        sym = jnp.where(phase == 0, sym_h, sym_l)
        f = jnp.where(
            phase == 0,
            jnp.take(tabs["flat_H"], cl * 16 + sym),
            jnp.take(tabs["flat_L"], gl * 16 + sym),
        )
        c = jnp.where(
            phase == 0,
            jnp.take(tabs["flat_cumH"], cl * 16 + sym),
            jnp.take(tabs["flat_cumL"], gl * 16 + sym),
        )
        byte = hi * 16 + sym
        cur = jax.lax.dynamic_slice(out, (0, 0, t), (B, K, 1))[:, :, 0]
        upd = jnp.where((phase == 1) & active, byte.astype(jnp.int32), cur)
        out = jax.lax.dynamic_update_slice(out, upd[:, :, None], (0, 0, t))
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
        hi = jnp.where(phase == 0, sym, hi)
        cl = jnp.where(
            (phase == 1) & active, jnp.take(tabs["flat_cmap"], byte), cl
        )
        return x, ptr, cl, hi, out

    out = jnp.zeros((B, K, Smax), dtype=jnp.int32)
    ptr = jnp.zeros((B,), dtype=jnp.int32)
    cl = jnp.full((B, K), 0, jnp.int32) + jnp.take(
        tabs["flat_cmap"], jnp.full((), CTX0, jnp.int32)
    )
    hi = jnp.zeros((B, K), jnp.int32)
    states, ptr, cl, hi, out = jax.lax.fori_loop(
        0, 2 * Smax, body_fn, (states, ptr, cl, hi, out)
    )
    return _ungrid(out.astype(jnp.uint8), S_b, dlen, K, Smax, N)
