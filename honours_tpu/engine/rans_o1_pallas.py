"""Pallas TPU kernels for the order-1 rANS engine (wire format v3).

Two kernels:

o1_lookup_pallas — elementwise (f, cum) lookup against the canned
  order-1 table for the ENCODE pre-pass.  A one-hot row-select matmul
  against the r~64 distinct cluster rows (tables/o1.py guarantees the
  clustered structure); the [E, 768] row matrix lives only in VMEM, so
  HBM traffic is 16 B/element instead of the ~3 KB/element a
  materialized XLA one-hot matmul would pay.  Tables are bf16-exact
  byte planes of the packed 24-bit value (f-1) + cum*4096; a 0/1
  one-hot times a <=255 plane with f32 accumulation is exact.

rans_o1_decode_pallas — the o1 extension of engine/rans_pallas.py:
  same shared-stream refill discipline and window scheme, plus a
  per-lane context carry (ctx = previous decoded symbol in the lane)
  and an in-kernel one-hot row-select (3-D dot_general, verified
  supported by Mosaic) that materializes each lane's CDF row for the
  slot -> symbol compare-reduce.

Byte/stream semantics match kernels.rans.rans_{en,de}code_o1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.kernels.rans import CTX0, M, PROB_BITS, RANS_L

R = 8    # reads per program (int32 sublane tile)
W = 384  # cached window bytes per read (as rans_pallas.py)
RB = 8    # lookup block rows
CB = 256  # lookup block cols (RB*CB elements per program)


def _lookup_kernel(sym_ref, ctx_ref, cmap_ref, tab_ref, fc_ref):
    r = tab_ref.shape[0]
    ctx = ctx_ref[:, :]  # [RB, CB]
    i257 = jax.lax.broadcasted_iota(jnp.int32, (RB, CB, 257), 2)
    cm = cmap_ref[0:1, :][:, None, :]  # [1, 1, 257]
    cctx = jnp.sum(jnp.where(ctx[:, :, None] == i257, cm, 0), axis=2)
    ir = jax.lax.broadcasted_iota(jnp.int32, (RB, CB, r), 2)
    oh = (cctx[:, :, None] == ir).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        oh, tab_ref[:, :], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [RB, CB, 768]
    sym = sym_ref[:, :]
    i256 = jax.lax.broadcasted_iota(jnp.int32, (RB, CB, 256), 2)
    ohs = (sym[:, :, None] == i256).astype(jnp.float32)
    p0 = jnp.sum(rows[:, :, 0:256] * ohs, axis=2).astype(jnp.int32)
    p1 = jnp.sum(rows[:, :, 256:512] * ohs, axis=2).astype(jnp.int32)
    p2 = jnp.sum(rows[:, :, 512:768] * ohs, axis=2).astype(jnp.int32)
    u = p0 * 65536 + p1 * 256 + p2  # (f-1) + cum * 4096
    fc_ref[:, :] = (u & (M - 1)) + 1 + ((u >> PROB_BITS) << 13)


@functools.partial(jax.jit, static_argnames=("interpret",))
def o1_lookup_pallas(sym, ctx, cmap, enc_planes, interpret: bool = False):
    """sym, ctx [B, G] i32 -> (f, c) [B, G] i32 exact table lookups."""
    B, G = sym.shape
    Bp = -(-B // RB) * RB
    Gp = -(-G // CB) * CB
    s = jnp.pad(sym, ((0, Bp - B), (0, Gp - G)))
    c_ = jnp.pad(ctx, ((0, Bp - B), (0, Gp - G)))
    fc = pl.pallas_call(
        _lookup_kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((Bp, Gp), jnp.int32),
        grid=(Bp // RB, Gp // CB),
        in_specs=[
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 257), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )(s, c_, cmap.reshape(1, 257), enc_planes)
    fc = fc[:B, :G]
    return fc & 8191, fc >> 13


def _decode_kernel(body_ref, states_ref, dlen_ref, sb_ref, cmap_ref, tab_ref,
                   out_ref, ptr_ref, *, nsteps: int, K: int):
    Kc = K
    r = tab_ref.shape[0]
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, Kc), 1)
    rowid_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 1)
    ).astype(jnp.float32)
    i257 = jax.lax.broadcasted_iota(jnp.int32, (R, Kc, 257), 2)
    ir = jax.lax.broadcasted_iota(jnp.int32, (R, Kc, r), 2)
    i256 = jax.lax.broadcasted_iota(jnp.int32, (R, Kc, 256), 2)
    cm = cmap_ref[0:1, :][:, None, :]  # [1, 1, 257]
    dlen = dlen_ref[:, 0:1]
    sb = sb_ref[:, 0:1]

    for q in range(R):
        ptr_ref[q] = 0

    def step(t, states, ctx, win, rel):
        active = (t < sb) & ((lanes * sb + t) < dlen)
        x = states
        slot = x & (M - 1)
        cctx = jnp.sum(jnp.where(ctx[:, :, None] == i257, cm, 0), axis=2)
        oh = (cctx[:, :, None] == ir).astype(jnp.bfloat16)
        rows = jax.lax.dot_general(
            oh, tab_ref[:, :], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [R, K, 768]
        # rows planes recombine in f32 (values < 2^24, f32-exact; f32
        # VPU multiply/add is single-pass where i32 multiply is not)
        w = (
            rows[:, :, 0:256] * 65536.0
            + rows[:, :, 256:512] * 256.0
            + rows[:, :, 512:768]
        )  # (cum_hi - 1) + (f - 1) * 4096, f32
        fr = jnp.floor(w * (1.0 / M))  # f - 1 (exact: w = fr*4096 + low12)
        cumhi1 = w - fr * float(M)
        slot_f = slot.astype(jnp.float32)
        ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
        sym = jnp.sum(ge, axis=-1).astype(jnp.int32)
        c = jnp.sum(ge * (fr + 1.0), axis=-1).astype(jnp.int32)
        f = jnp.sum(
            (sym[:, :, None] == i256).astype(jnp.float32) * (fr + 1.0),
            axis=-1,
        ).astype(jnp.int32)
        newx = f * (x >> PROB_BITS) + slot - c
        x = jnp.where(active, newx, x)

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
        wcols = jax.lax.broadcasted_iota(jnp.int32, (R, Kc, W), 2)
        # one fused f32 reduce fetches both bytes (see rans_pallas.py)
        oh = (idx_a[:, :, None] == wcols).astype(jnp.float32) + 256.0 * (
            idx_b[:, :, None] == wcols
        ).astype(jnp.float32)
        winf = win[:, None, :].astype(jnp.float32)
        v = jnp.sum(oh * winf, axis=-1).astype(jnp.int32)
        b_a = v & 0xFF
        b_b = (v >> 8) & 0xFF
        x = jnp.where(need1, (x << 8) | b_a, x)
        x = jnp.where(need2, (x << 8) | b_b, x)
        rel = rel + cnt1 + cnt2
        ctx = jnp.where(active, sym, ctx)
        return x, ctx, sym, rel

    def group(g, carry):
        states, ctx, rel = carry
        new_rel = jnp.zeros((R, 1), jnp.int32)
        win = jnp.zeros((R, W), jnp.int32)
        rid1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        for q in range(R):
            p = ptr_ref[q] + jnp.sum(rel[q : q + 1, 0:1])
            base = pl.multiple_of((p >> 7) << 7, 128)
            ptr_ref[q] = base
            loaded = body_ref[q : q + 1, pl.ds(base, W)].astype(jnp.int32)
            win = jnp.where(rowid_w == q, loaded, win)
            new_rel = jnp.where(rid1 == q, p - base, new_rel)
        rel = new_rel
        syms = []
        for j in range(4):
            states, ctx, sym, rel = step(g * 4 + j, states, ctx, win, rel)
            syms.append(sym)
        out_ref[:, pl.ds(pl.multiple_of(g * 4 * Kc, 128), 4 * Kc)] = (
            jnp.concatenate(syms, axis=1)
        )
        return states, ctx, rel

    states = states_ref[:, :]
    ctx = jnp.full((R, Kc), CTX0, jnp.int32)
    rel = jnp.zeros((R, 1), jnp.int32)
    jax.lax.fori_loop(0, nsteps // 4, group, (states, ctx, rel))


@functools.partial(jax.jit, static_argnames=("Smax", "K", "interpret"))
def rans_o1_decode_pallas(body, states, dlen, S_b, cmap, dec_planes,
                          Smax: int, K: int, interpret: bool = False):
    """body [B, Mb] u8 (v3 body aligned to column 0), states [B, K] i32,
    dlen/S_b [B] i32 -> lane grid [B, K, Smax] u8."""
    B, Mb = body.shape
    assert B % R == 0, B
    nsteps4 = -(-Smax // 4) * 4
    Wout = nsteps4 * K
    Mp = ((Mb + 127) // 128) * 128 + W
    body_i = jnp.pad(body.astype(jnp.int32), ((0, 0), (0, Mp - Mb)))

    out = pl.pallas_call(
        functools.partial(_decode_kernel, nsteps=nsteps4, K=K),
        out_shape=jax.ShapeDtypeStruct((B, Wout), jnp.int32),
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, Mp), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 257), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, Wout), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((R,), jnp.int32)],
        interpret=interpret,
    )(
        body_i,
        states.astype(jnp.int32),
        dlen.astype(jnp.int32)[:, None],
        S_b.astype(jnp.int32)[:, None],
        cmap.reshape(1, 257),
        dec_planes,
    )
    # step-major [B, t*K + k] -> lane grid [B, K, Smax]
    grid = out.reshape(B, nsteps4, K).transpose(0, 2, 1)[:, :, :Smax]
    return grid.astype(jnp.uint8)
