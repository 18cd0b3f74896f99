"""Pallas TPU kernels for the monotone permutation walks.

The XLA formulation in engine/permute.py pays log2(N) full-HBM passes
per walk (and its faster u8-packed variant triggers an XLA fusion
miscompile at B=256 — reproduced on hardware).  Here whole row blocks
live in VMEM and the log-shift walk runs inside ONE Mosaic kernel:
~17 register-resident passes, HBM traffic drops to one read + one write
of the operands, and the XLA fusion bug is bypassed entirely (Mosaic
compiles the walk directly).

Two kernel shapes, both parameterized by the shift-bit base `sb`:
- 1-channel: the word fuses (shift << sb | payload | alive); used for
  byte payloads (sb=9, value in bits 1..8) and for shift-as-payload
  (sb=1, compaction_shifts).
- 2-channel: separate value + (shift<<1|alive) word for wide payloads.

Rows per program adapt to the row width so the live VMEM stays under
the 16 MB scoped limit.  Static per-pass shifts are pltpu.roll + an
iota edge mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: widest row the kernels accept.  NOT a VMEM limit (rows per program
#: adapt below): the walk body unrolls nbits passes over the whole row's
#: vregs, so Mosaic compile time scales with width — a 467K-wide
#: 1-channel walk measured > 9 min to compile (r5).  Callers needing
#: wider moves should restructure (see engine/dstall.py's two-stage
#: narrow assembly) rather than raise these.
MAX_COLS = 1 << 18       # 1-channel (u8-fused / shift-payload) walks
MAX_COLS_WIDE = 1 << 17  # 2-channel (wide payload) walks
R = 8  # max rows per program (int32 sublane tile)


def _pick_rows(Np: int, nch: int) -> int:
    """Largest rows-per-program whose estimated live VMEM fits the
    100 MiB scoped budget (see _vmem_limit's 3.2-buffers/channel
    measurement)."""
    for rows in (8, 4, 2, 1):
        if rows * Np * 4 * (3 * nch + 2) <= (100 << 20):
            return rows
    return 1


def _vmem_limit(Np: int, nch: int, rows: int = R) -> int:
    """Scoped-VMEM limit for a walk: measured live ~= 3.2 buffers/channel
    at rows=8 (scratch + roll temp + in-flight DMA).  v5e has 128 MiB of
    VMEM; the compiler's 16 MiB default is just a default."""
    need = rows * Np * 4 * (3 * nch + 2)
    return int(min(100 << 20, max(16 << 20, need)))


def _nbits(n: int) -> int:
    return max(1, (int(n) - 1).bit_length())


def _roll_right(x, k: int, cols):
    return jnp.where(cols >= k, pltpu.roll(x, k, axis=1), 0)


def _roll_left(x, k: int, cols, N: int):
    # circular right-roll by N-k == left shift by k (wrapped tail masked)
    return jnp.where(cols < N - k, pltpu.roll(x, N - k, axis=1), 0)


def _walk_body(chans, N, nbits, sb, left):
    """The log-shift walk on register-resident channels (w last)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    w = chans[-1]
    ks = range(nbits) if left else reversed(range(nbits))
    for k in ks:
        bit = 1 << k
        wbit = 1 << (k + sb)
        if left:
            srcs = [_roll_left(c, bit, cols, N) for c in chans]
        else:
            srcs = [_roll_right(c, bit, cols) for c in chans]
        incoming = (srcs[-1] & (1 | wbit)) == (1 | wbit)
        leaving = (w & (1 | wbit)) == (1 | wbit)
        chans = [jnp.where(incoming, s, c) for s, c in zip(srcs[:-1], chans[:-1])]
        w = jnp.where(incoming, srcs[-1], jnp.where(leaving, 0, w))
        chans = chans + [w]
    return chans


def _walk_kernel(*refs, N, nbits, sb, left, nch, rows):
    """HBM-resident I/O; one [rows, N] block DMA'd into VMEM scratch per
    program, walked in place, DMA'd out — keeps live VMEM to the
    scratches plus one roll temp."""
    in_refs = refs[:nch]
    out_refs = refs[nch : 2 * nch]
    scratch = refs[2 * nch : 3 * nch]
    sems = refs[3 * nch]
    b = pl.program_id(0)

    for i in range(nch):
        pltpu.make_async_copy(
            in_refs[i].at[pl.ds(b * rows, rows), :], scratch[i], sems.at[i]
        ).start()
    for i in range(nch):
        pltpu.make_async_copy(
            in_refs[i].at[pl.ds(b * rows, rows), :], scratch[i], sems.at[i]
        ).wait()
    chans = [s[:, :] for s in scratch]
    chans = _walk_body(chans, N, nbits, sb, left)
    for i in range(nch):
        scratch[i][:, :] = chans[i]
        pltpu.make_async_copy(
            scratch[i], out_refs[i].at[pl.ds(b * rows, rows), :], sems.at[i]
        ).start()
    for i in range(nch):
        pltpu.make_async_copy(
            scratch[i], out_refs[i].at[pl.ds(b * rows, rows), :], sems.at[i]
        ).wait()


@functools.partial(
    jax.jit, static_argnames=("sb", "left", "nbits", "interpret")
)
def _walk(chans, sb: int, left: bool, nbits: int, interpret: bool = False):
    """chans: tuple of [B, N] i32 arrays (the fused word last)."""
    B, N = chans[0].shape
    Np = -(-N // 128) * 128
    nch = len(chans)
    rows = _pick_rows(Np, nch)
    Bp = -(-B // rows) * rows
    padded = [
        jnp.pad(c.astype(jnp.int32), ((0, Bp - B), (0, Np - N)))
        for c in chans
    ]
    outs = pl.pallas_call(
        functools.partial(
            _walk_kernel, N=Np, nbits=nbits, sb=sb, left=left, nch=nch,
            rows=rows,
        ),
        out_shape=tuple(
            jax.ShapeDtypeStruct((Bp, Np), jnp.int32) for _ in range(nch)
        ),
        grid=(Bp // rows,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * nch,
        out_specs=tuple(
            pl.BlockSpec(memory_space=pltpu.ANY) for _ in range(nch)
        ),
        scratch_shapes=[pltpu.VMEM((rows, Np), jnp.int32) for _ in range(nch)]
        + [pltpu.SemaphoreType.DMA((nch,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(Np, nch, rows)
        ),
        interpret=interpret,
    )(*padded)
    outs = outs if isinstance(outs, (tuple, list)) else (outs,)
    return tuple(o[:B, :N] for o in outs)


def _walk1(w, sb, left, nbits, interpret=False):
    return _walk((w,), sb, left, nbits, interpret)[0]


def _walk2(a, w, left, nbits, interpret=False):
    return _walk((a, w), 1, left, nbits, interpret)


def expand_walk(values, shift, valid, width: int, interpret: bool = False):
    """monotone_expand via the VMEM-resident kernels.  Same contract as
    engine.permute.monotone_expand (fill = 0)."""
    B, N = values.shape
    pad = width - N
    nbits = _nbits(width)
    if values.dtype == jnp.uint8 and width < (1 << 22):
        w = jnp.where(
            valid, (shift << 9) | (values.astype(jnp.int32) << 1) | 1, 0
        )
        wv = _walk1(jnp.pad(w, ((0, 0), (0, pad))), 9, False, nbits, interpret)
        alive = (wv & 1) == 1
        out = ((wv >> 1) & 0xFF).astype(jnp.uint8)
        return jnp.where(alive, out, jnp.uint8(0)), alive
    a = jnp.pad(values.astype(jnp.int32), ((0, 0), (0, pad)))
    w = jnp.pad(jnp.where(valid, (shift << 1) | 1, 0), ((0, 0), (0, pad)))
    av, wv = _walk2(a, w, False, nbits, interpret)
    alive = (wv & 1) == 1
    return jnp.where(alive, av, 0).astype(values.dtype), alive


def compact_walk(values, keep, interpret: bool = False):
    """monotone_compact via the VMEM-resident kernels."""
    B, N = values.shape
    holes = jnp.cumsum((~keep).astype(jnp.int32), axis=1) - (~keep).astype(
        jnp.int32
    )
    count = keep.sum(axis=1).astype(jnp.int32)
    nbits = _nbits(N)
    if values.dtype == jnp.uint8 and N < (1 << 22):
        w = jnp.where(
            keep, (holes << 9) | (values.astype(jnp.int32) << 1) | 1, 0
        )
        wv = _walk1(w, 9, True, nbits, interpret)
        alive = (wv & 1) == 1
        out = ((wv >> 1) & 0xFF).astype(jnp.uint8)
        return jnp.where(alive, out, jnp.uint8(0)), count
    a = jnp.where(keep, values.astype(jnp.int32), 0)
    w = jnp.where(keep, (holes << 1) | 1, 0)
    av, wv = _walk2(a, w, True, nbits, interpret)
    alive = (wv & 1) == 1
    return jnp.where(alive, av, 0).astype(values.dtype), count


def compaction_shifts_walk(keep, interpret: bool = False):
    """engine.permute.compaction_shifts via the 1-channel kernel (the
    shift doubles as the payload, exactly as the XLA path)."""
    B, N = keep.shape
    holes = jnp.cumsum((~keep).astype(jnp.int32), axis=1) - (~keep).astype(
        jnp.int32
    )
    count = keep.sum(axis=1).astype(jnp.int32)
    w = jnp.where(keep, (holes << 1) | 1, 0)
    wv = _walk1(w, 1, True, _nbits(N), interpret)
    alive = (wv & 1) == 1
    return jnp.where(alive, wv >> 1, 0), count
