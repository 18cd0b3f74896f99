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
    segs = [
        (use.astype(jnp.uint8)[:, None], jnp.full((B,), 1, jnp.int32)),
        (hdr8, jnp.where(use, 8, 0)),
        (st_s, jnp.where(use, sl_s, 0)),
        (u32le_bytes(jnp.where(use, sl_n, sl_p)), jnp.full((B,), 4, jnp.int32)),
        (st_n, jnp.where(use, sl_n, 0)),
        (st_p, jnp.where(use, 0, sl_p)),
    ]
    total = 1 + 8 + st_s.shape[1] + 4 + max(st_n.shape[1], st_p.shape[1]) + 8
    return rowwise_concat(segs, total)


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
