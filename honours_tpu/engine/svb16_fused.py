"""Fully-fused svb16 (VBZ container) codec kernels — one Mosaic kernel
per direction.

Round-2 ran svb16 as XLA glue around one Pallas walk; the glue (zigzag,
key packbits, interleave, cumsum, masks — each a full-HBM pass at
[B, 2L]+) cost ~3x the walk itself.  Here the ENTIRE codec runs inside
one kernel per 8-row block: HBM traffic drops to one read of the input
and one write of the output, with every intermediate VMEM-resident.

The formulation also replaces the interleaved-candidate compaction of
engine/svb16.py with a *field expansion*: sample j's 1-or-2-byte field
starts at data byte j + e(j) (e = exclusive count of 2-byte fields
before j), which is dense in [0, n + ntwo) — so the data stream is ONE
expand walk (no second compaction), and the key area is a small static
stride-8 compact.  Decode inverts it: the same e (recovered from the
key bitmap) gives the field-start indicator via one expand walk, and one
2-channel compact collects each field's 16-bit window back to sample
order.  Streams are byte-identical to engine/svb16.py and hence to the
reference C (press/svb16/encode_scalar.c:11-56, decode_scalar.c:27).

All cross-lane moves are pltpu.roll-based: cumsums by shift-doubling,
walks via permute_pallas._walk_body.  Per-row ragged placement (the
kl = ceil(n/8) key area) uses per-row dynamic-lane stores/loads, not
rowwise shift walks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.engine.permute_pallas import _nbits, _roll_right, _walk_body

R = 8  # rows per program (int32 sublane tile)


def _roll_left(x, k: int, cols, N: int):
    return jnp.where(cols < N - k, pltpu.roll(x, N - k, axis=1), 0)


def _icumsum(x, N: int, mask: int = -1):
    """Inclusive cumsum along lanes via shift-doubling (log2 N passes).
    With `mask`, every partial sum is masked (exact for modular sums)."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    for k in range(_nbits(N)):
        x = x + _roll_right(x, 1 << k, cols)
        if mask != -1:
            x = x & mask
    return x


def _row_roll(x, amt, left: bool):
    """Shift each row by its own amount in [0, 128) (Mosaic dynamic-lane
    stores must be 128-aligned, so the sub-vreg part of a ragged
    placement happens here as 7 masked roll passes)."""
    N = x.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)
    for b in (1, 2, 4, 8, 16, 32, 64):
        if left:
            rolled = jnp.where(cols < N - b, pltpu.roll(x, N - b, axis=1), 0)
        else:
            rolled = jnp.where(cols >= b, pltpu.roll(x, b, axis=1), 0)
        x = jnp.where((amt & b) != 0, rolled, x)
    return x


def _encode_kernel(sig_ref, n_ref, out_ref, olen_ref, *, L: int, zd: bool,
                   rr: int):
    KL = L // 8
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    colsL = jax.lax.broadcasted_iota(jnp.int32, (rr, L), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * L), 1)
    cols2r = jax.lax.broadcasted_iota(jnp.int32, (rr, 2 * L), 1)
    n = jnp.concatenate(
        [n_ref[q, 0] * jnp.ones((1, 1), jnp.int32) for q in range(rr)], axis=0
    )
    s = sig_ref[:, :]
    if zd:
        u = s & 0xFFFF
        prev = jnp.where(colsL >= 1, pltpu.roll(u, 1, axis=1), 0)
        d = (u - prev) & 0xFFFF
        sign = (0x10000 - (d >> 15)) & 0xFFFF
        v = ((d + d) & 0xFFFF) ^ sign
    else:
        v = s & 0xFFFF
    valid = colsL < n
    v = jnp.where(valid, v, 0)
    two = ((v >= 256) & valid).astype(jnp.int32)
    e_inc = _icumsum(two, L)
    e = e_inc - two  # exclusive
    ntwo = e_inc[:, L - 1 : L]
    kl = (n + 7) >> 3

    # --- data stream: expand each sample's field to byte j + e(j) ---
    a = jnp.concatenate([v, jnp.zeros((rr, L), jnp.int32)], axis=1)
    w = jnp.concatenate(
        [jnp.where(valid, (e << 1) | 1, 0), jnp.zeros((rr, L), jnp.int32)],
        axis=1,
    )
    a, w = _walk_body([a, w], 2 * L, _nbits(L), 1, False)
    alive = (w & 1) == 1
    ndata = n + ntwo
    prev_a = jnp.where(cols2 >= 1, pltpu.roll(a, 1, axis=1), 0)
    data = jnp.where(alive, a & 0xFF, (prev_a >> 8) & 0xFF)
    data = jnp.where(cols2r < ndata, data, 0)

    # --- key bytes: packbits at stride-8, compacted 8j' -> j' ---
    acc = two
    for i in range(1, 8):
        acc = acc + (_roll_left(two, i, colsL, L) << i)
    keepk = ((colsL & 7) == 0) & ((colsL >> 3) < kl)
    holes = cols - (cols >> 3)
    wk = jnp.where(keepk, (holes << 9) | (acc << 1) | 1, 0)
    (wk,) = _walk_body([wk], L, _nbits(L), 9, True)
    keys = jnp.where((wk & 1) == 1, (wk >> 1) & 0xFF, 0)

    W = KL + 2 * L + 128
    out_ref[:, :] = jnp.zeros((rr, W), jnp.int32)
    out_ref[:, 0:KL] = keys[:, :KL]
    # ragged data placement at byte kl: Mosaic dynamic-lane stores must
    # be 128-aligned, so shift by kl%128 with masked rolls, then
    # read-modify-write the aligned window (the head of the window holds
    # the key area's tail and must survive)
    data_sh = _row_roll(
        jnp.concatenate([data, jnp.zeros((rr, 128), jnp.int32)], axis=1),
        kl & 127, left=False,
    )
    colw = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * L + 128), 1)
    for q in range(rr):
        kl_q = (n_ref[q, 0] + 7) >> 3
        sl = pl.ds(pl.multiple_of((kl_q >> 7) * 128, 128), 2 * L + 128)
        cur = out_ref[q : q + 1, sl]
        out_ref[q : q + 1, sl] = jnp.where(
            colw >= (kl_q & 127), data_sh[q : q + 1, :], cur
        )
    olen_ref[:, :] = kl + ndata


@functools.partial(jax.jit, static_argnames=("zd", "interpret"))
def svb16_encode_fused(sig, n, zd: bool = True, interpret: bool = False):
    """[B, L] int16 + lengths -> (stream [B, L//8 + 2L] u8, out_len [B]).
    Byte-identical to engine.svb16.svb16_encode_batch."""
    B, L = sig.shape
    KL = L // 8
    Bp = -(-B // R) * R
    sigp = jnp.pad(sig.astype(jnp.int32), ((0, Bp - B), (0, 0)))
    np_ = jnp.pad(n.astype(jnp.int32), (0, Bp - B))[:, None]
    W = KL + 2 * L + 128
    out, olen = pl.pallas_call(
        functools.partial(_encode_kernel, L=L, zd=zd, rr=R),
        out_shape=(
            jax.ShapeDtypeStruct((Bp, W), jnp.int32),
            jax.ShapeDtypeStruct((Bp, 1), jnp.int32),
        ),
        grid=(Bp // R,),
        in_specs=[
            pl.BlockSpec((R, L), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec((R, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 << 20, R * (16 * L) * 4 * 3))
        ),
        interpret=interpret,
    )(sigp, np_)
    return out[:B, : KL + 2 * L].astype(jnp.uint8), olen[:B, 0]


def _decode_kernel(st_ref, n_ref, out_ref, data_ref, *, L: int, zd: bool,
                   rr: int):
    KL = L // 8
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    colsL = jax.lax.broadcasted_iota(jnp.int32, (rr, L), 1)
    cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * L), 1)
    n = jnp.concatenate(
        [n_ref[q, 0] * jnp.ones((1, 1), jnp.int32) for q in range(rr)], axis=0
    )
    valid = colsL < n

    # key bits -> two/e on the sample grid.  Mosaic cannot minor-merge a
    # broadcast ([rr, KL, 8] -> [rr, L]), so the x8 upsample runs as a
    # static expand walk (key byte j' -> lane 8j', shift 7j') plus a
    # 7-roll spread that copies each stride-8 byte across its 8 lanes.
    keys = jnp.concatenate(
        [st_ref[:, 0:KL], jnp.zeros((rr, L - KL), jnp.int32)], axis=1
    )
    wk = jnp.where(
        colsL < (n + 7) >> 3,
        ((cols * 7) << 9) | ((keys & 0xFF) << 1) | 1,
        0,
    )
    (wk,) = _walk_body([wk], L, _nbits(L), 9, False)
    kg = jnp.where((wk & 1) == 1, (wk >> 1) & 0xFF, 0)
    spread = kg
    for i in range(1, 8):
        spread = spread + _roll_right(kg, i, cols)
    two = jnp.where(valid, (spread >> (colsL & 7)) & 1, 0)
    e_inc = _icumsum(two, L)
    e = e_inc - two

    # align the ragged data area to column 0: 128-aligned dynamic loads
    # (Mosaic lane-alignment rule), then sub-vreg left roll by kl%128
    kl = (n + 7) >> 3
    for q in range(rr):
        kl_q = (n_ref[q, 0] + 7) >> 3
        data_ref[q : q + 1, :] = st_ref[
            q : q + 1,
            pl.ds(pl.multiple_of((kl_q >> 7) * 128, 128), 2 * L + 128),
        ]
    data = _row_roll(data_ref[:, :], kl & 127, left=True)[:, : 2 * L]
    win16 = data | (_roll_left(data, 1, cols2, 2 * L) << 8)

    # field-start indicator m at byte j + e(j): one 1-bit expand walk
    wsrc = jnp.concatenate(
        [
            jnp.where(valid, (e << 2) | (two << 1) | 1, 0),
            jnp.zeros((rr, L), jnp.int32),
        ],
        axis=1,
    )
    (wm,) = _walk_body([wsrc], 2 * L, _nbits(L), 2, False)
    m = (wm & 1).astype(jnp.int32)
    two_f = (wm >> 1) & 1

    # compact each field's 16-bit window back to sample order
    j_inc = _icumsum(m, 2 * L)
    holes = cols2 - (j_inc - m)
    val = jnp.where(two_f == 1, win16, win16 & 0xFF)
    a = jnp.where(m == 1, val, 0)
    wc = jnp.where(m == 1, (holes << 1) | 1, 0)
    a, wc = _walk_body([a, wc], 2 * L, _nbits(2 * L), 1, True)
    v = jnp.where(valid, a[:, :L], 0)

    if zd:
        d = ((v >> 1) ^ ((0x10000 - (v & 1)) & 0xFFFF)) & 0xFFFF
        ssum = _icumsum(jnp.where(valid, d, 0), L, mask=0xFFFF)
        out = ssum - ((ssum & 0x8000) << 1)
    else:
        out = v - ((v & 0x8000) << 1)
    out_ref[:, :] = jnp.where(valid, out, 0)


@functools.partial(jax.jit, static_argnames=("L", "zd", "interpret"))
def svb16_decode_fused(stream, n, L: int, zd: bool = True,
                       interpret: bool = False):
    """[B, M] u8 + lengths -> [B, L] int16 (padded lanes 0).
    Byte-identical to engine.svb16.svb16_decode_batch."""
    B, M = stream.shape
    KL = L // 8
    Bp = -(-B // R) * R
    W = KL + 2 * L + 128
    st = stream.astype(jnp.int32)
    st = (
        jnp.pad(st, ((0, Bp - B), (0, W - M)))
        if M < W
        else jnp.pad(st[:, :W], ((0, Bp - B), (0, 0)))
    )
    np_ = jnp.pad(n.astype(jnp.int32), (0, Bp - B))[:, None]
    out = pl.pallas_call(
        functools.partial(_decode_kernel, L=L, zd=zd, rr=R),
        out_shape=jax.ShapeDtypeStruct((Bp, L), jnp.int32),
        grid=(Bp // R,),
        in_specs=[
            pl.BlockSpec((R, W), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda b: (b, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((R, L), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R, 2 * L + 128), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 << 20, R * (18 * L) * 4 * 3))
        ),
        interpret=interpret,
    )(st, np_)
    return out[:B].astype(jnp.int16)
