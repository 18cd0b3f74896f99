"""Batched TPU engine for dstall_srans2 (stall-aware srans2 flagship).

Per batch: ONE lax.scan stall segmentation (segment.find_stall_batch),
the stall-region and nonstall-region extractions as monotone
data movements, THREE batched srans2 encodes (stall branch, nonstall
branch, plain whole-read), and a per-row min-pick exactly like the
reference's dstall_fz (press/press.c:8003-8019).  Decode runs the two
branch decodes and re-interleaves with a monotone expansion.

Byte-exact with codecs.dstall.DstallSrans2Codec wherever the batched
segmenter and the C oracle agree on boundaries (they match on real
signal; segment/__init__.py documents the knife-edge caveat).

Encode cost (r5 chip profile, tools/chip_dstall.py, [256, 64Ki]):
226 ms e2e = 3 x 28 ms srans2 encodes (mandated by the reference's
encode-both-then-min-pick semantics, press/press.c:8003-8019) + 18 ms
segmentation scan + ~124 ms of branch extraction (monotone_compact,
rowwise shifts) and 6-segment assembly walks.  The throughput ceiling
under these semantics is srans2_enc/3 ~ 0.4 GB/s; closing the walk
overhead is the remaining lever, the three encodes are not.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from honours_tpu.engine.bits import (
    read_u16le,
    read_u32le,
    rowwise_concat,
    u16le_bytes,
    u32le_bytes,
)
from honours_tpu.engine.permute import (
    monotone_compact,
    monotone_expand,
    rowwise_shift_left,
    rowwise_shift_right,
)
from honours_tpu.engine.pipeline import depress_srans2_batch, press_srans2_batch
from honours_tpu.segment import find_stall_batch
from honours_tpu.utils.config import get_config


def _split_batch(sig, n):
    """Batched codecs.dstall._split: (exists, start, length) per row."""
    cfg = get_config()
    ex, start, length = find_stall_batch(sig, n)
    ok = ex & (length >= cfg.stall_threshold)
    start = start + cfg.stall_margin
    length = length - 2 * cfg.stall_margin
    ok = ok & (length > 0) & (start <= 0xFFFF) & (length <= 0xFFFF)
    start = jnp.where(ok, start, 0)
    length = jnp.where(ok, length, 0)
    return ok, start, length


def _assemble_split(use, hdr8, st_s, sl_s, st_n, sl_n, st_p, sl_p,
                    total: int):
    """Narrow two-stage assembly of the split stream layout
    [flag | hdr8 | st_s | u32 tail_len | tail].

    The one-shot formulation (stack all three branch buffers, compact)
    stacks to ~3x the branch width — at [256, 64Ki] that is 467K
    columns, past the Pallas walk width cap (Mosaic compile time scales
    with width), so it fell back to the 105 ms XLA log-shift path.
    Here: min-pick the tail bytes FIRST (st_n vs st_p are alternatives,
    never both emitted), concat the head and the tail separately, and
    land the tail after the head with one monotone expansion — three
    walks, each ~(branch width + 13) wide.  `total` must be a sound
    bound on the emitted length (the expansion drops overflow)."""
    B, Ms = st_s.shape
    Wt = max(st_n.shape[1], st_p.shape[1])
    st_n = jnp.pad(st_n, ((0, 0), (0, Wt - st_n.shape[1])))
    st_p = jnp.pad(st_p, ((0, 0), (0, Wt - st_p.shape[1])))
    tail = jnp.where(use[:, None], st_n, st_p)
    tail_len = jnp.where(use, sl_n, sl_p)
    out1, len1 = rowwise_concat(
        [
            (use.astype(jnp.uint8)[:, None], jnp.full((B,), 1, jnp.int32)),
            (hdr8, jnp.where(use, 8, 0)),
            (st_s, jnp.where(use, sl_s, 0)),
        ],
        9 + Ms,
    )
    out2, len2 = rowwise_concat(
        [
            (u32le_bytes(tail_len), jnp.full((B,), 4, jnp.int32)),
            (tail, tail_len),
        ],
        4 + Wt,
    )
    W = max(total, out2.shape[1], out1.shape[1])
    pos2 = jnp.arange(out2.shape[1], dtype=jnp.int32)[None, :]
    valid = pos2 < len2[:, None]
    sh = jnp.broadcast_to(jnp.where(valid, len1[:, None], 0), out2.shape)
    exp, cov = monotone_expand(out2, sh, valid, W)
    out1p = jnp.pad(out1, ((0, 0), (0, W - out1.shape[1])))
    out = jnp.where(cov, exp, out1p)
    return out[:, :total], len1 + len2


@functools.partial(jax.jit, static_argnames=("emax",))
def press_dstall_batch(sig, n, tabs, emax: int = None):
    """Batched dstall_srans2 encode -> (stream [B, M] u8, len [B])."""
    B, L = sig.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    ok, start, length = _split_batch(sig, n)

    # stall region to column 0; rows without a stall encode 1 dummy sample
    stall_sig = rowwise_shift_left(sig.astype(jnp.int32), start, L)
    stall_sig = jnp.where(pos < length[:, None], stall_sig, 0).astype(jnp.int16)
    n_stall = jnp.maximum(length, 1)
    st_s, sl_s = press_srans2_batch(stall_sig, n_stall, tabs, emax)

    # nonstall = the read with [start, start+length) removed
    keep = valid & ~((pos >= start[:, None]) & (pos < (start + length)[:, None]))
    ns_sig, _ = monotone_compact(sig.astype(jnp.int32), keep)
    st_n, sl_n = press_srans2_batch(
        ns_sig.astype(jnp.int16), jnp.maximum(n - length, 1), tabs, emax
    )

    # plain whole-read branch (the reference encodes both and min-picks)
    st_p, sl_p = press_srans2_batch(sig, n, tabs, emax)

    split_total = 1 + 8 + sl_s + 4 + sl_n
    plain_total = 1 + 4 + sl_p
    use = ok & (split_total < plain_total)

    hdr8 = jnp.concatenate(
        [u16le_bytes(start), u16le_bytes(length), u32le_bytes(sl_s)], axis=1
    )
    # the min-pick guarantees emitted total <= plain_total <= 5 + sl_p,
    # so 13 + Ms bounds every row's emitted length
    total = 13 + st_s.shape[1] + 8
    return _assemble_split(use, hdr8, st_s, sl_s, st_n, sl_n, st_p, sl_p,
                           total)


@functools.partial(jax.jit, static_argnames=("L", "emax"))
def depress_dstall_batch(stream, n, tabs, L: int, emax: int = None):
    """Batched dstall_srans2 decode -> [B, L] int16."""
    B, M = stream.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    zero = jnp.zeros((B,), jnp.int32)
    use = jnp.take_along_axis(
        stream, jnp.zeros((B, 1), jnp.int32), axis=1
    )[:, 0].astype(jnp.int32) > 0
    start = jnp.where(use, read_u16le(stream, zero + 1).astype(jnp.int32), 0)
    length = jnp.where(use, read_u16le(stream, zero + 3).astype(jnp.int32), 0)
    stall_len = jnp.where(use, read_u32le(stream, zero + 5).astype(jnp.int32), 0)

    stall_stream = rowwise_shift_left(stream, zero + 9, M)
    d_stall = depress_srans2_batch(
        stall_stream, jnp.maximum(length, 1), tabs, L, emax=emax
    )

    ns_off = jnp.where(use, 9 + stall_len + 4, 1 + 4)
    ns_stream = rowwise_shift_left(stream, ns_off, M)
    n_ns = jnp.maximum(n - length, 1)
    d_ns = depress_srans2_batch(ns_stream, n_ns, tabs, L, emax=emax)

    # re-interleave: ns values shift right by `length` from `start` on
    ns_valid = pos < n_ns[:, None]
    shift = jnp.where(pos >= start[:, None], length[:, None], 0)
    ns_grid, _ = monotone_expand(
        d_ns.astype(jnp.int32), jnp.where(ns_valid, shift, 0), ns_valid, L
    )
    stall_grid = rowwise_shift_right(d_stall.astype(jnp.int32), start, L)
    in_stall = (pos >= start[:, None]) & (pos < (start + length)[:, None])
    out = jnp.where(in_stall, stall_grid, ns_grid)
    return jnp.where(pos < n[:, None], out, 0).astype(jnp.int16)
