"""Pallas TPU kernels for the nibble-factorized rANS engine (format v4).

The srans3 decode walk: each byte is TWO 16-symbol rANS steps — the
cum/freq row of the active context materializes with a [RK, r] x [r, 64]
one-hot matmul over 6-bit bf16-exact planes (Mosaic f32 matmuls round
through bf16, so raw 12-bit f32 tables are NOT exact on hardware), and
rank/c/f come from 16-wide compares and sums.  NOTE the measured
outcome (round 3, v5e): the narrow search does NOT beat the v3 byte
kernel — elementwise ops cost vreg granularity (ceil(rows*K/8) sublane
groups x >= 1 lane tile), so 16-wide tensors occupy as many vregs as
64-wide ones, and the doubled step count plus the per-byte lo-context
gathers make srans3 decode slower than srans2's.  Kept as a correct,
byte-exact alternative format; srans2 remains the flagship.

o1n_fc_gather_pallas: the encode-side per-byte (fc_hi, fc_lo) lookups
as chunked single-vreg gathers (same route as o1_fc_gather_pallas).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.engine.rans_o1_pallas import WW, _gather_chunks, _taa
from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L

RB = 8
CB = 512


def pick_rows_n4(B: int, N: int) -> int:
    for rows in (64, 32, 16, 8):
        if B % rows == 0 and rows * 13 * max(N, 4096) <= (96 << 20):
            return rows
    return 8


# ---------------------------------------------------------------------------
# encode lookup
# ---------------------------------------------------------------------------


def _fc_kernel(sym_ref, ctx_ref, cmap_ref, lo_ref, fch_ref, fcl_ref,
               oh_ref, ol_ref):
    cm = cmap_ref[:, :]
    lot = lo_ref[:, :]
    th = fch_ref[:, :]
    tl = fcl_ref[:, :]
    outs_h, outs_l = [], []
    for b in range(CB // 128):
        s = sym_ref[:, b * 128 : (b + 1) * 128]
        c = ctx_ref[:, b * 128 : (b + 1) * 128]
        cl = _gather_chunks(cm, c, 3)
        hi = s >> 4
        lo = s & 15
        idx = cl * 16 + hi
        outs_h.append(_gather_chunks(th, idx, 8))
        gl = _gather_chunks(lot, idx, 8)
        outs_l.append(_gather_chunks(tl, gl * 16 + lo, 8))
    oh_ref[:, :] = jnp.concatenate(outs_h, axis=1)
    ol_ref[:, :] = jnp.concatenate(outs_l, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def o1n_fc_gather_pallas(sym, ctx, cmap_pad, lo_assign_pad, fcH_tab, fcL_tab,
                         interpret: bool = False):
    """sym [B, G] bytes, ctx [B, G] in [0,256] -> (fc_hi, fc_lo) i32."""
    B, G = sym.shape
    Bp = -(-B // RB) * RB
    Gp = -(-G // CB) * CB
    s = jnp.pad(sym, ((0, Bp - B), (0, Gp - G)))
    c_ = jnp.pad(ctx, ((0, Bp - B), (0, Gp - G)))
    oh, ol = pl.pallas_call(
        _fc_kernel,
        interpret=interpret,
        out_shape=(
            jax.ShapeDtypeStruct((Bp, Gp), jnp.int32),
            jax.ShapeDtypeStruct((Bp, Gp), jnp.int32),
        ),
        grid=(Bp // RB, Gp // CB),
        in_specs=[
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
    )(s, c_, cmap_pad, lo_assign_pad, fcH_tab, fcL_tab)
    return oh[:B, :G], ol[:B, :G]


# ---------------------------------------------------------------------------
# decode walk
# ---------------------------------------------------------------------------


def _decode_kernel(bodyw_ref, states_ref, dlen_ref, sb_ref, cmap_ref, lo_ref,
                   ph_ref, pl_ref, out_ref, ptr_ref,
                   *, nsteps: int, K: int, rr: int):
    Kc = K
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc), 1)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 1)
    ).astype(jnp.float32)
    rH = ph_ref.shape[0]
    rL = pl_ref.shape[0]
    irH = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, rH), 2)
    irL = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, rL), 2)
    i16 = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, 16), 2)
    cm = cmap_ref[:, :]
    lot = lo_ref[:, :]
    dlen = dlen_ref[:, 0:1]
    sb = sb_ref[:, 0:1]
    kz = jnp.zeros((rr, 128 - Kc), jnp.int32)

    def pad_k(a):
        return jnp.concatenate([a, kz], axis=1)

    for q in range(rr):
        ptr_ref[q] = 0

    def refill(x, active, win, rel):
        need1 = active & (x < RANS_L)
        need2 = active & (x < (RANS_L >> 8))
        f1 = need1.astype(jnp.float32)
        f2 = need2.astype(jnp.float32)
        rank1 = jax.lax.dot_general(
            f1, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        rank2 = jax.lax.dot_general(
            f2, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt1 = jnp.sum(need1.astype(jnp.int32), axis=1, keepdims=True)
        cnt2 = jnp.sum(need2.astype(jnp.int32), axis=1, keepdims=True)
        idx_a = rel + rank1
        idx_b = rel + cnt1 + rank2
        bidx = jnp.concatenate([idx_a, idx_b, kz[:, : 128 - 2 * Kc]], axis=1)
        bidx = jnp.clip(bidx, 0, 4 * WW - 1)
        widx = bidx >> 2
        wlo = widx & 127
        w = jnp.where(
            widx < 128, _taa(win[:, :128], wlo), _taa(win[:, 128:], wlo)
        )
        byts = (w >> ((bidx & 3) * 8)) & 0xFF
        x = jnp.where(need1, (x << 8) | byts[:, :Kc], x)
        x = jnp.where(need2, (x << 8) | byts[:, Kc : 2 * Kc], x)
        return x, rel + cnt1 + cnt2

    def phase(x, active, ids, planes, ir, win, rel):
        slot = x & (M - 1)
        oh = (ids[:, :, None] == ir).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            oh, planes, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rr, K, 64]: 6-bit planes of cum_hi | freq
        cumhi = rows[:, :, :16] * 64.0 + rows[:, :, 16:32]
        freq = rows[:, :, 32:48] * 64.0 + rows[:, :, 48:64]
        slot_f = slot.astype(jnp.float32)
        ge = (slot_f[:, :, None] >= cumhi).astype(jnp.float32)
        rank = jnp.sum(ge, axis=-1).astype(jnp.int32)
        c = jnp.sum(ge * freq, axis=-1).astype(jnp.int32)
        eq = (rank[:, :, None] == i16).astype(jnp.float32)
        f = jnp.sum(eq * freq, axis=-1).astype(jnp.int32)
        newx = f * (x >> PROB_BITS) + slot - c
        x = jnp.where(active, newx, x)
        x, rel = refill(x, active, win, rel)
        return x, rank, rel

    def step(t, states, cl, win, rel):
        active = (t < sb) & ((lanes * sb + t) < dlen)
        x, hi, rel = phase(states, active, cl, ph_ref[:, :], irH, win, rel)
        gl = _gather_chunks(lot, pad_k(cl * 16 + hi), 8)[:, :Kc]
        x, lo, rel = phase(x, active, gl, pl_ref[:, :], irL, win, rel)
        byte = hi * 16 + lo
        cl = jnp.where(active, _gather_chunks(cm, pad_k(byte), 2)[:, :Kc], cl)
        return x, cl, byte, rel

    rowid_w = jax.lax.broadcasted_iota(jnp.int32, (rr, WW), 0)
    rid1 = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0)

    def reload(win, rel):
        new_rel = jnp.zeros((rr, 1), jnp.int32)
        for q in range(rr):
            p = ptr_ref[q] + jnp.sum(rel[q : q + 1, 0:1])
            base = pl.multiple_of((p >> 9) << 9, 512)
            ptr_ref[q] = base
            loaded = bodyw_ref[
                q : q + 1, pl.ds(pl.multiple_of((base >> 9) * 128, 128), WW)
            ]
            win = jnp.where(rowid_w == q, loaded, win)
            new_rel = jnp.where(rid1 == q, p - base, new_rel)
        return win, new_rel

    def supergroup(sg, carry):
        states, cl, rel = carry
        win = jnp.zeros((rr, WW), jnp.int32)
        syms = []
        for gg in range(4):
            win, rel = reload(win, rel)
            for j in range(4):
                states, cl, byte, rel = step(
                    (sg * 4 + gg) * 4 + j, states, cl, win, rel
                )
                syms.append(byte)
        out_ref[:, pl.ds(pl.multiple_of(sg * 16 * Kc, 16 * Kc), 16 * Kc)] = (
            jnp.concatenate(syms, axis=1)
        )
        return states, cl, rel

    states = states_ref[:, :]
    cl0 = _gather_chunks(cm, jnp.full((rr, 128), 256, jnp.int32), 3)[:, :Kc]
    rel = jnp.zeros((rr, 1), jnp.int32)
    jax.lax.fori_loop(0, nsteps // 16, supergroup, (states, cl0, rel))


@functools.partial(
    jax.jit, static_argnames=("Smax", "K", "interpret", "rows")
)
def rans_n4_decode_pallas(body, states, dlen, S_b, tabs, Smax: int, K: int,
                          interpret: bool = False, rows: int = 8):
    """body [B, Mb] u8 (v4 body at column 0) -> lane grid [B, K, Smax] u8."""
    B, Mb = body.shape
    assert B % rows == 0, B
    assert K % 4 == 0 and 2 * K <= 128 and (4 * K) % 128 == 0, K
    nsteps16 = -(-Smax // 16) * 16  # BYTE steps
    Mp = ((Mb + 511) // 512) * 512 + 4 * WW * 2
    pb = jnp.pad(body, ((0, 0), (0, Mp - Mb))).reshape(B, Mp // 4, 4)
    bodyw = (
        pb[:, :, 0].astype(jnp.int32)
        | (pb[:, :, 1].astype(jnp.int32) << 8)
        | (pb[:, :, 2].astype(jnp.int32) << 16)
        | (pb[:, :, 3].astype(jnp.int32) << 24)
    )
    Wout = nsteps16 * K
    out = pl.pallas_call(
        functools.partial(_decode_kernel, nsteps=nsteps16, K=K, rr=rows),
        out_shape=jax.ShapeDtypeStruct((B, Wout), jnp.int32),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, Mp // 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, Wout), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((rows,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(100 << 20,
                    max(16 << 20, 2 * rows * (Mp + 4 * Wout) + (4 << 20)))
            )
        ),
        interpret=interpret,
    )(
        bodyw,
        states.astype(jnp.int32),
        dlen.astype(jnp.int32)[:, None],
        S_b.astype(jnp.int32)[:, None],
        tabs["cmap_pad"],
        tabs["lo_assign_pad"],
        tabs["planes_h"],
        tabs["planes_l"],
    )
    grid = out.reshape(B, nsteps16, K).transpose(0, 2, 1)[:, :, :Smax]
    return grid.astype(jnp.uint8)
