"""Pallas TPU kernel for the rANS encode state walk (formats v2 and v3).

The XLA encode loops in entropy.py / entropy_o1.py pay ~2048 sequential
while-loop iterations of tiny [B, K] ops per batch — dominated by loop
overhead, not math.  Both formats reduce to the same core once f/cum are
precomputed per element: walk the K lane states backwards over steps,
renormalize (<= 2 byte emissions per lane per step), and record the
candidate bytes + emission flags.  That core runs here as ONE Mosaic
kernel per 8-read block.

Layout contract (shared with the XLA path):
- input fc: [B, Smax*K] i32, step-major (column t*K + lane), value
  f + cum*8192 for active elements and 0 for inactive (f >= 1 always).
- output plane: [B, Smax*2K] i32, column t*2K + j holding
  byte | flag<<8 in exactly the (candidate, keep) layout the XLA loop
  produces — feed `plane & 255` / `plane >> 8` to monotone_compact.
- output states: [B, K] final lane states.

The state fits i32 throughout: x < 2^31 by the rANS invariant
(x < f * 2^19 before the update, so newx < 2^31 + 12 bits of slack);
x >= f * 2^19 is tested overflow-free as (x >> 19) >= f.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.kernels.rans import PROB_BITS, RANS_L

R = 8  # reads per program (int32 sublane tile)


def _divmod_f32(x, f):
    """floor(x/f), x%f for 0 <= x < 2^31 i32, f in [1, 4096] — two-step
    base-4096 long division in exact f32 (mirrors entropy._divmod_smallf)."""
    ff = f.astype(jnp.float32)
    xh = x >> PROB_BITS
    qh = jnp.floor(xh.astype(jnp.float32) / ff).astype(jnp.int32)
    rh = xh - qh * f
    qh = qh + (rh >= f).astype(jnp.int32) - (rh < 0).astype(jnp.int32)
    rh = rh - jnp.where(rh >= f, f, 0) + jnp.where(rh < 0, f, 0)
    v = rh * 4096 + (x & 4095)
    ql = jnp.floor(v.astype(jnp.float32) / ff).astype(jnp.int32)
    r = v - ql * f
    ql = ql + (r >= f).astype(jnp.int32) - (r < 0).astype(jnp.int32)
    r = r - jnp.where(r >= f, f, 0) + jnp.where(r < 0, f, 0)
    return qh * 4096 + ql, r


def _encode_kernel(fc_ref, plane_ref, states_ref, *, ngroups: int, K: int,
                   rr: int = R):
    def step(fc, states):
        active = fc > 0
        f = fc & 8191
        c = fc >> 13
        x = states
        b1 = x & 0xFF
        over1 = active & ((x >> 19) >= f)
        x = jnp.where(over1, x >> 8, x)
        b2 = x & 0xFF
        over2 = active & ((x >> 19) >= f)
        x = jnp.where(over2, x >> 8, x)
        fs = jnp.where(active, f, 1)
        q, r = _divmod_f32(x, fs)
        newx = (q << PROB_BITS) + r + c
        states = jnp.where(active, newx, x)
        plane = jnp.concatenate(
            [
                jnp.where(over2, b2, b1) | (over1.astype(jnp.int32) << 8),
                b1 | (over2.astype(jnp.int32) << 8),
            ],
            axis=1,
        )
        return states, plane

    def group(g_rev, states):
        # 4 steps per group: 4*K = 128 keeps dynamic loads/stores aligned
        g = ngroups - 1 - g_rev  # walk groups backwards (encode order)
        chunk = fc_ref[:, pl.ds(pl.multiple_of(g * 4 * K, 128), 4 * K)]
        planes = [None] * 4
        for j in (3, 2, 1, 0):
            states, planes[j] = step(chunk[:, j * K : (j + 1) * K], states)
        plane_ref[:, pl.ds(pl.multiple_of(g * 8 * K, 256), 8 * K)] = (
            jnp.concatenate(planes, axis=1)
        )
        return states

    states = jnp.full((rr, K), RANS_L, jnp.int32)
    states = jax.lax.fori_loop(0, ngroups, group, states)
    states_ref[:, :] = states


def pick_enc_rows(B: int, Smax: int, K: int) -> int:
    """Rows per program: more sublane rows hide the serial step chain's
    op latencies (the per-step math is tiny [rows, K] vector work).
    Bounded by VMEM: the in/out blocks are ~12*Smax*K bytes/row
    (fc i32 + plane i32 x2), doubled for pipeline buffers."""
    for rows in (32, 16, 8):
        if B % rows == 0 and 2 * rows * (12 * Smax * K) <= (88 << 20):
            return rows
    return R


@functools.partial(jax.jit, static_argnames=("Smax", "K", "interpret"))
def rans_encode_core_pallas(fc, Smax: int, K: int, interpret: bool = False):
    """fc [B, Smax*K] i32 step-major -> (plane [B, Smax*2K] i32,
    states [B, K] i32).  Requires 4K % 128 == 0 (K=32)."""
    B = fc.shape[0]
    assert B % R == 0 and (4 * K) % 128 == 0, (B, K)
    rows = pick_enc_rows(B, Smax, K)
    S2 = -(-Smax // 4) * 4
    fcp = jnp.pad(fc, ((0, 0), (0, (S2 - Smax) * K)))
    plane, states = pl.pallas_call(
        functools.partial(_encode_kernel, ngroups=S2 // 4, K=K, rr=rows),
        out_shape=(
            jax.ShapeDtypeStruct((B, S2 * 2 * K), jnp.int32),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
        ),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, S2 * K), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, S2 * 2 * K), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(100 << 20,
                    max(16 << 20, 2 * rows * (S2 * K * 4 * 3) + (4 << 20)))
            )
        ),
        interpret=interpret,
    )(fcp)
    return plane[:, : Smax * 2 * K], states
