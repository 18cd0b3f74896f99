"""Pallas TPU kernel for shared-stream rANS decode (format v2).

The decode recurrence is serial per lane, so the kernel keeps the K=32
lane states of R=8 reads in vector registers and walks all steps inside
one Mosaic loop — no per-step XLA dispatch, no gathers:

- symbol/f/c lookup: 256-wide compare + multiply-reduce against the
  frequency vector (c = cum[sym] falls out of the same ge-mask),
- refill: the shared-stream format makes each step's byte group
  contiguous; both potential bytes of a lane are fetched in ONE one-hot
  pass (x < 2^15 already implies the second refill, independent of the
  first byte's value, so no intermediate dependency),
- windows: a 512-byte per-read window lives in vector carry and is
  refreshed from VMEM only once per 4-step group (scalar pointer work
  is the bottleneck; consumption is <= 64 bytes/step),
- output: 4 steps (= 128 symbols/read) are packed per 128-aligned store.

Matches kernels.rans.rans_decode_shared byte-for-byte.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L, K_SHARED

R = 8   # reads per program (int32 sublane tile)
W = 384  # cached window bytes per read (>= 4 steps * 2K + 128 alignment)


def _decode_kernel(body_ref, states_ref, dlen_ref, tabs_ref, out_ref, ptr_ref,
                   *, nsteps: int, K: int):
    Kc = K
    lanes = jax.lax.broadcasted_iota(jnp.int32, (R, Kc), 1)
    rowid_w = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 1)
    ).astype(jnp.float32)  # tri[j, k] = j < k
    # f32 table rows: values <= 4096 are f32-exact, and f32 VPU
    # multiply/add is single-pass where i32 multiply is not
    cum_hi = tabs_ref[0:1, :].astype(jnp.float32)[:, None, :]  # cum[s+1]
    freqv = tabs_ref[1:2, :].astype(jnp.float32)[:, None, :]   # freq[s]
    dlen = dlen_ref[:, 0:1]

    for r in range(R):
        ptr_ref[r] = 0

    def step(t, states, win, rel):
        active = (t * Kc + lanes) < dlen
        x = states
        slot = x & (M - 1)
        slot_f = slot.astype(jnp.float32)
        ge = (slot_f[:, :, None] >= cum_hi).astype(jnp.float32)  # [R,K,256]
        sym = jnp.sum(ge, axis=-1).astype(jnp.int32)
        c = jnp.sum(ge * freqv, axis=-1).astype(jnp.int32)
        eq = (
            sym[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, 256), 2)
        ).astype(jnp.float32)
        f = jnp.sum(eq * freqv, axis=-1).astype(jnp.int32)
        newx = f * (x >> PROB_BITS) + slot - c
        x = jnp.where(active, newx, x)

        # refill: second byte needed iff x < 2^15 (independent of byte 1)
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
        idx_a = rel + rank1                 # first consumed byte per lane
        idx_b = rel + cnt1 + rank2          # second (round-2) byte
        wcols = jax.lax.broadcasted_iota(jnp.int32, (R, Kc, W), 2)
        # one fused f32 reduce fetches both bytes: v = b_a + 256*b_b
        # (<= 65535, f32-exact); garbage b_b for !need2 lanes stays in
        # the high byte and never corrupts b_a
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
        return x, sym, rel

    def group(g, carry):
        states, rel = carry
        # refresh windows: fold rel into the scalar pointers, reload
        new_rel = jnp.zeros((R, 1), jnp.int32)
        win = jnp.zeros((R, W), jnp.int32)
        rid1 = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0)
        for r in range(R):
            p = ptr_ref[r] + jnp.sum(rel[r : r + 1, 0:1])
            base = pl.multiple_of((p >> 7) << 7, 128)
            ptr_ref[r] = base
            loaded = body_ref[r : r + 1, pl.ds(base, W)].astype(jnp.int32)
            win = jnp.where(rowid_w == r, loaded, win)
            new_rel = jnp.where(rid1 == r, p - base, new_rel)
        rel = new_rel
        syms = []
        for j in range(4):
            states, sym, rel = step(g * 4 + j, states, win, rel)
            syms.append(sym)
        out_ref[:, pl.ds(pl.multiple_of(g * 4 * Kc, 128), 4 * Kc)] = (
            jnp.concatenate(syms, axis=1)
        )
        return states, rel

    states = states_ref[:, :]
    rel = jnp.zeros((R, 1), jnp.int32)
    jax.lax.fori_loop(0, nsteps // 4, group, (states, rel))


@functools.partial(jax.jit, static_argnames=("N", "K", "interpret"))
def rans_decode_pallas(body, states, dlen, cume, N: int, K: int = K_SHARED,
                       interpret: bool = False):
    """body [B, Mb] u8 (stream body aligned to column 0), states [B, K] i32,
    dlen [B] i32, cume [257] i32 CDF-with-sentinel -> data [B, N] u8."""
    B, Mb = body.shape
    assert B % R == 0, B
    nsteps = -(-N // K)
    nsteps4 = -(-nsteps // 4) * 4
    Wout = nsteps4 * K
    Mp = ((Mb + 127) // 128) * 128 + W
    body_i = jnp.pad(body.astype(jnp.int32), ((0, 0), (0, Mp - Mb)))
    cum_hi = cume.astype(jnp.int32)[1:257]
    freqv = cum_hi - cume.astype(jnp.int32)[:256]
    tabs = jnp.stack([cum_hi, freqv])  # [2, 256]

    out = pl.pallas_call(
        functools.partial(_decode_kernel, nsteps=nsteps4, K=K),
        out_shape=jax.ShapeDtypeStruct((B, Wout), jnp.int32),
        grid=(B // R,),
        in_specs=[
            pl.BlockSpec((R, Mp), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 256), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, Wout), lambda b: (b, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((R,), jnp.int32)],
        interpret=interpret,
    )(body_i, states.astype(jnp.int32), dlen.astype(jnp.int32)[:, None], tabs)
    return out[:, :N].astype(jnp.uint8)
