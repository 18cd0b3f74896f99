"""Batched order-1 static-CDF rANS (wire format v3) — the srans2 engine.

TPU-parallel equivalent of the reference's context-conditioned entropy
class (rccsenc order-1 / rcmsenc context mixing,
press/Turbo-Range-Coder/turborc.h:48,75 used by rcc_*/rccm_* methods,
press/press.c:6531-7223): conditioning on the previous byte is kept, but
the model is the canned 257x256 12-bit CDF (tables/o1.py) so both encode
and decode stay lane-parallel.

Lanes are block-interleaved (lane k owns [k*S, (k+1)*S) of the byte
stream) so each symbol's context is its predecessor IN THE SAME LANE —
available in lockstep decode one step earlier.  Byte-exact with the host
kernels/rans.py rans_{en,de}code_o1 including the per-read S = ceil(n/K)
header: the engine builds the lane grid with one monotone_expand whose
shift (j // S_b) * (Smax - S_b) is non-decreasing, so ragged batch rows
produce exactly the host stream.

Table lookups f[ctx, sym] / cum[ctx, sym]:
- host/CPU fallback: flat jnp.take (exact),
- TPU: one-hot row select on the MXU with the table split into
  bf16-exact hi/lo byte planes (a 0/1 one-hot times a <=255 plane is
  exact in bf16 with f32 accumulation); the Pallas lookup kernel keeps
  the [chunk, 1024] row matrix in VMEM so HBM traffic stays at
  16 B/element instead of the 4 KB/element a materialized XLA row
  matrix would cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.bits import read_u32le, rowwise_concat, u32le_bytes
from honours_tpu.engine.permute import (
    monotone_compact,
    monotone_expand,
    rowwise_shift_left,
)
from honours_tpu.kernels.rans import CTX0, M, PROB_BITS, RANS_L, K_SHARED

U32 = jnp.uint32


def make_o1_tables(freq_tab: np.ndarray) -> dict:
    """Device tables for a [257, 256] order-1 frequency table.

    The canned table has clustered structure (tables/o1.py: only
    R_CLUSTERS distinct rows); np.unique recovers it here with no
    metadata, so the engine works against r ~ 64 cluster rows instead
    of 257 contexts.  Returns dict with:
      flat_f / flat_c: [257*256] i32 flattened freq / cum-low (take route)
      cum_ext: [257, 257] i32 per-context CDF with the M sentinel (XLA
               fallback decode)
      cmap: [257] i32 context -> cluster row
      cmap_pad: [3, 128] i32 cmap as single-vreg gather chunks
      fc_tab: [128, 128] i32 flattened [r, 256] encode values
              f + cum_low * 8192 (gather-route encode lookup)
      planes_full: [r, 512] bf16 6-bit planes of cum_hi-1 per cluster
              (bf16-exact; one-hot matmul materializes the full row)
    """
    ft = np.asarray(freq_tab, dtype=np.int64)
    assert ft.shape == (257, 256) and (ft.sum(axis=1) == M).all()
    cum = np.concatenate(
        [np.zeros((257, 1), np.int64), np.cumsum(ft, axis=1)], axis=1
    )
    c_lo = cum[:, :256]
    urows, cmap = np.unique(ft, axis=0, return_inverse=True)
    r = urows.shape[0]
    assert 2 * r <= 16384, r  # fc_tab must fit the 128-chunk gather scan
    ucum = np.cumsum(urows, axis=1)  # cum_hi rows: ucum[:, s] = cum[s+1]
    uclo = ucum - urows
    cmap_pad = np.zeros((3, 128), np.int64)
    cmap_pad.reshape(-1)[:257] = cmap.reshape(-1)
    fc_tab = np.zeros((128, 128), np.int64)
    fc_tab.reshape(-1)[: r * 256] = (urows + uclo * 8192).reshape(-1)
    v = ucum - 1  # cum_hi - 1, 12-bit
    # full-row 6-bit planes: one-hot over the cluster alone materializes
    # the whole 256-sym cum row (cheaper one-hot + no coarse gathers than
    # the round-2 quarter split; measured 57 vs 72 ms at [256, 64Ki])
    planes_full = np.zeros((r, 512), np.int64)
    planes_full[:, :256] = v >> 6
    planes_full[:, 256:] = v & 63
    return dict(
        planes_full=jnp.asarray(planes_full, jnp.bfloat16),
        flat_f=jnp.asarray(ft.reshape(-1), jnp.int32),
        flat_c=jnp.asarray(c_lo.reshape(-1), jnp.int32),
        cum_ext=jnp.asarray(cum, jnp.int32),
        cmap=jnp.asarray(cmap.reshape(-1), jnp.int32),
        cmap_pad=jnp.asarray(cmap_pad, jnp.int32),
        fc_tab=jnp.asarray(fc_tab, jnp.int32),
    )


def _o1_fc_take(sym, ctx, tabs):
    """Exact flat-gather lookup (host/CPU path)."""
    idx = ctx * 256 + sym
    return jnp.take(tabs["flat_f"], idx), jnp.take(tabs["flat_c"], idx)


def _o1_fc(sym, ctx, tabs):
    if jax.default_backend() == "tpu":
        from honours_tpu.engine.rans_o1_pallas import o1_fc_gather_pallas

        fc = o1_fc_gather_pallas(sym, ctx, tabs["cmap_pad"], tabs["fc_tab"])
        return fc & 8191, fc >> 13
    return _o1_fc_take(sym, ctx, tabs)


def _u32le_grid(x):
    """[B, K] -> [B, 4K] u8 little-endian."""
    B, K = x.shape
    shifts = jnp.array([0, 8, 16, 24], U32).reshape(1, 1, 4)
    return (
        ((x.astype(U32)[:, :, None] >> shifts) & jnp.uint32(0xFF))
        .astype(jnp.uint8)
        .reshape(B, 4 * K)
    )


def _lane_grid(data, dlen, K: int, Smax: int):
    """[B, N] linear bytes -> [B, K*Smax] block-interleaved lane grid.

    grid[b, k*Smax + t] = data[b, k*S_b + t] for t < S_b, where
    S_b = ceil(dlen/K).  The move is a monotone expansion: source j
    lands at j + (j // S_b) * (Smax - S_b), non-decreasing in j.
    Returns (grid i32, ctx i32, act bool) each [B, K, Smax], plus S_b.
    """
    B, N = data.shape
    G = K * Smax
    S_b = -(-dlen // K)
    S_div = jnp.maximum(S_b, 1)[:, None]
    j = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = j < dlen[:, None]
    shift = jnp.where(valid, (j // S_div) * (Smax - S_b[:, None]), 0)
    grid, alive = monotone_expand(data.astype(jnp.int32), shift, valid, G)
    g3 = grid.reshape(B, K, Smax)
    act = alive.reshape(B, K, Smax)
    ctx3 = jnp.concatenate(
        [jnp.full((B, K, 1), CTX0, jnp.int32), g3[:, :, :-1]], axis=2
    )
    return g3, ctx3, act, S_b


@functools.partial(jax.jit, static_argnames=("K",))
def rans_o1_encode_batch(data, dlen, tabs, K: int = K_SHARED):
    """[B, N] u8 + lengths -> (stream [B, Mo] u8, stream_len [B]).

    Wire format v3: [S:u32 LE][K states u32 LE][shared body].  Byte-exact
    with kernels.rans.rans_encode_o1(row, tab, K) per row.
    """
    B, N = data.shape
    Smax = -(-N // K)
    g3, ctx3, act3, S_b = _lane_grid(data, dlen, K, Smax)
    f3, c3 = [
        a.reshape(B, K, Smax)
        for a in _o1_fc(g3.reshape(B, -1), ctx3.reshape(B, -1), tabs)
    ]
    return encode_from_fc(f3, c3, act3, S_b, K)


def rans_o1_encode_parts(data, dlen, tabs, K: int = K_SHARED):
    """Like rans_o1_encode_batch but returns (segs, plane_width) with a
    sparse final segment, for callers that fold the body compaction
    into their own rowwise_concat walk."""
    B, N = data.shape
    Smax = -(-N // K)
    g3, ctx3, act3, S_b = _lane_grid(data, dlen, K, Smax)
    f3, c3 = [
        a.reshape(B, K, Smax)
        for a in _o1_fc(g3.reshape(B, -1), ctx3.reshape(B, -1), tabs)
    ]
    return encode_from_fc(f3, c3, act3, S_b, K, parts=True)


def encode_from_fc(f3, c3, act3, S_b, K: int, parts: bool = False):
    """Shared encode tail: (f, c) per lane-grid position -> v3 stream.
    Also used by the drans (v5) engine, whose f/c mix two tables.

    With parts=True, returns the body as concat SEGMENTS — the last one
    sparse (candidate plane + keep mask) — so the caller's
    rowwise_concat folds the body compaction into its single walk
    instead of paying a separate full-width compact pass.
    """
    B, K_, Smax = f3.shape

    if jax.default_backend() == "tpu" and B % 8 == 0:
        # Pallas state walk (one Mosaic kernel, no XLA while loop)
        from honours_tpu.engine.rans_encode_pallas import (
            rans_encode_core_pallas,
        )

        fc3 = jnp.where(act3, f3 + c3 * 8192, 0)
        fc = jnp.transpose(fc3, (0, 2, 1)).reshape(B, Smax * K)
        plane, states_i = rans_encode_core_pallas(fc, Smax, K)
        cand = (plane & 255).astype(jnp.uint8)
        keepm = (plane >> 8) == 1
        segs = [
            (u32le_bytes(S_b), jnp.full((B,), 4, jnp.int32)),
            (_u32le_grid(states_i), jnp.full((B,), 4 * K, jnp.int32)),
            (cand, keepm),
        ]
        if parts:
            return segs, cand.shape[1]
        body_bytes, body_len = monotone_compact(cand, keepm)
        segs[-1] = (body_bytes, body_len)
        return rowwise_concat(segs, 4 + 4 * K + body_bytes.shape[1])

    def body(i, carry):
        states, groups, flags = carry
        t = Smax - 1 - i
        sl = lambda a: jax.lax.dynamic_slice(a, (0, 0, t), (B, K, 1))[:, :, 0]
        active = sl(act3)
        f = jnp.where(active, sl(f3), 1)
        c = jnp.where(active, sl(c3), 0)
        x = states
        ubound = f.astype(U32) * jnp.uint32((RANS_L >> PROB_BITS) << 8)
        b1 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        over1 = active & (x >= ubound)
        x = jnp.where(over1, x >> jnp.uint32(8), x)
        b2 = (x & jnp.uint32(0xFF)).astype(jnp.uint8)
        over2 = active & (x >= ubound)
        x = jnp.where(over2, x >> jnp.uint32(8), x)
        from honours_tpu.engine.entropy import _divmod_smallf

        q, r = _divmod_smallf(x, f)
        newx = (q << jnp.uint32(PROB_BITS)) + r + c.astype(U32)
        states = jnp.where(active, newx, x)
        g = jnp.concatenate([jnp.where(over2, b2, b1), b1], axis=1)
        fl = jnp.concatenate([over1, over2], axis=1)
        groups = jax.lax.dynamic_update_slice(groups, g[None], (t, 0, 0))
        flags = jax.lax.dynamic_update_slice(flags, fl[None], (t, 0, 0))
        return states, groups, flags

    states = jnp.full((B, K), RANS_L, dtype=U32)
    groups = jnp.zeros((Smax, B, 2 * K), dtype=jnp.uint8)
    flags = jnp.zeros((Smax, B, 2 * K), dtype=bool)
    states, groups, flags = jax.lax.fori_loop(
        0, Smax, body, (states, groups, flags)
    )

    cand = jnp.transpose(groups, (1, 0, 2)).reshape(B, Smax * 2 * K)
    keep = jnp.transpose(flags, (1, 0, 2)).reshape(B, Smax * 2 * K)

    segs = [
        (u32le_bytes(S_b), jnp.full((B,), 4, jnp.int32)),
        (_u32le_grid(states), jnp.full((B,), 4 * K, jnp.int32)),
        (cand, keep),
    ]
    if parts:
        return segs, cand.shape[1]
    body_bytes, body_len = monotone_compact(cand, keep)
    segs[-1] = (body_bytes, body_len)
    return rowwise_concat(segs, 4 + 4 * K + body_bytes.shape[1])


@functools.partial(jax.jit, static_argnames=("N", "K"))
def rans_o1_decode_batch(stream, base_off, dlen, tabs, N: int,
                         K: int = K_SHARED):
    """Decode [B] v3 streams at base_off -> data [B, N] u8 (first dlen
    valid).  Handles per-row S from the stream header (so host-codec
    streams with S = ceil(n/K) decode too)."""
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

    if jax.default_backend() == "tpu":
        import os

        from honours_tpu.engine.rans_o1_pallas import (
            R,
            pick_dec_rows,
            rans_o1_decode_pallas,
        )

        rows = int(os.environ.get("HTPU_DEC_ROWS", 0)) or pick_dec_rows(
            B, N, Mb
        )
        if rows and B % rows == 0:
            # the kernel's windows start at an arbitrary per-row byte
            # offset, so the whole stream goes in as-is (no rowwise
            # body-alignment shift — that pass alone cost ~30 ms at
            # [256, 90K] in round 2)
            grid = rans_o1_decode_pallas(
                stream, states.astype(jnp.int32), dlen,
                S_b, tabs["cmap_pad"], tabs["planes_full"],
                Smax, K, rows=rows, body_off=base_off + 4 + 4 * K,
            )
            return _ungrid(grid, S_b, dlen, K, Smax, N)

    body = rowwise_shift_left(stream, base_off + 4 + 4 * K, Mb)

    cum_ext = tabs["cum_ext"]

    def body_fn(t, carry):
        states, ptr, ctx, out = carry
        active = (t < S_b[:, None]) & ((lanes * S_b[:, None] + t) < dlen[:, None])
        x = states
        slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
        rows = jnp.take(cum_ext, ctx, axis=0)  # [B, K, 257]
        ge = (slot[:, :, None] >= rows[:, :, 1:]).astype(jnp.int32)
        sym = ge.sum(axis=2)
        c = jnp.sum(ge * (rows[:, :, 1:] - rows[:, :, :256]), axis=2)
        i256 = jnp.arange(256, dtype=jnp.int32)
        eq = (sym[:, :, None] == i256[None, None, :]).astype(jnp.int32)
        f = jnp.sum(eq * (rows[:, :, 1:] - rows[:, :, :256]), axis=2)
        out = jax.lax.dynamic_update_slice(
            out, sym.astype(jnp.uint8)[:, :, None], (0, 0, t)
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
        ctx = jnp.where(active, sym, ctx)
        return x, ptr, ctx, out

    out = jnp.zeros((B, K, Smax), dtype=jnp.uint8)
    ptr = jnp.zeros((B,), dtype=jnp.int32)
    ctx = jnp.full((B, K), CTX0, jnp.int32)
    states, ptr, ctx, out = jax.lax.fori_loop(
        0, Smax, body_fn, (states, ptr, ctx, out)
    )
    return _ungrid(out, S_b, dlen, K, Smax, N)


def _ungrid(out3, S_b, dlen, K: int, Smax: int, N: int):
    """[B, K, Smax] lane grid -> [B, N] linear bytes (per-row S_b)."""
    B = out3.shape[0]
    t = jnp.arange(Smax, dtype=jnp.int32)[None, None, :]
    k = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    keep = (t < S_b[:, None, None]) & (
        (k * S_b[:, None, None] + t) < dlen[:, None, None]
    )
    lin, _ = monotone_compact(
        out3.reshape(B, K * Smax), keep.reshape(B, K * Smax)
    )
    return lin[:, :N]
