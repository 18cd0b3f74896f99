"""Batched TPU engine for dstall_drans (stall-aware self-contained
flagship, codecs/dstall_drans.py).

Encode runs the trial + final min-pick protocol with shared-fit branch
groups (reference min-pick semantics, press/press.c:8003-8019, made
group-consistent): ONE batched segmentation, a grouped drans trial of
the plain branch over all rows and of the stall/nonstall branches over
the segmented rows, a per-row size pick frozen from the trial, and a
grouped re-encode of any branch whose membership changed.  The two
host syncs (any-stall, pick vector) happen at batch granularity.

Decode partitions rows by their flag byte and runs three member-masked
drans group decodes (plain / stall / nonstall), then re-interleaves the
split rows with the same monotone expansion dstall_srans2 uses.

Byte-exact with codecs.dstall_drans wherever the batched segmenter and
the C oracle agree on boundaries (segment/__init__.py documents the
knife-edge caveat) — asserted on real signal in
tests/test_dstall_drans.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.bits import (
    read_u16le,
    read_u32le,
    rowwise_concat,
    u16le_bytes,
    u32le_bytes,
)
from honours_tpu.engine.drans import depress_drans_batch, press_drans_batch
from honours_tpu.engine.dstall import _assemble_split, _split_batch
from honours_tpu.engine.permute import (
    monotone_compact,
    monotone_expand,
    rowwise_shift_left,
    rowwise_shift_right,
)


def _branch_signals(sig, n, ok, start, length):
    """(stall_sig, n_stall, ns_sig, n_ns) for the two split branches."""
    B, L = sig.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    stall_sig = rowwise_shift_left(sig.astype(jnp.int32), start, L)
    stall_sig = jnp.where(pos < length[:, None], stall_sig, 0).astype(jnp.int16)
    n_stall = jnp.maximum(length, 1)
    keep = valid & ~((pos >= start[:, None]) & (pos < (start + length)[:, None]))
    ns_sig, _ = monotone_compact(sig.astype(jnp.int32), keep)
    return stall_sig, n_stall, ns_sig.astype(jnp.int16), jnp.maximum(n - length, 1)


def _assemble(use, start, length, st_s, sl_s, st_n, sl_n, st_p, sl_p,
              L: int):
    hdr8 = jnp.concatenate(
        [u16le_bytes(start), u16le_bytes(length), u32le_bytes(sl_s)], axis=1
    )
    # Sound emitted-total bound for the narrow assembly: unlike
    # dstall_srans2's exact min-pick, the pick here is frozen from the
    # TRIAL sizes and the final shared-fit re-encode may drift, so bound
    # affinely instead: a drans stream over `len` values emits at most
    # 2*len body bytes plus the width formula's fixed part
    # (over = Md - 2*(L-1)); the two split branches' contents sum to n,
    # so 13 + 2*(L-1) + 2*over (+ lane-padding slack) covers every row.
    Md = max(st_n.shape[1], st_p.shape[1])
    over = max(Md - 2 * (L - 1), 0)
    total = 13 + 2 * (L - 1) + 2 * over + 1024
    return _assemble_split(use, hdr8, st_s, sl_s, st_n, sl_n, st_p, sl_p,
                           total)


def press_dstall_drans_batch(sig, n, tabs, emax: int = None):
    """Batched dstall_drans encode -> (stream [B, M] u8, len [B]).

    Not a single jit: the min-pick protocol syncs the segmentation and
    the trial pick to the host to decide which grouped encodes run."""
    B, L = sig.shape
    emax = emax or L
    ok, start, length = _split_batch(sig, n)
    st_p, sl_p = press_drans_batch(sig, n, tabs, emax)
    okh = np.asarray(ok)
    zero = jnp.zeros((B,), jnp.int32)
    if not okh.any():
        use = jnp.zeros((B,), bool)
        return _assemble(use, zero, zero, jnp.zeros((B, 16), jnp.uint8),
                         zero, jnp.zeros((B, 16), jnp.uint8), zero, st_p,
                         sl_p, L)

    stall_sig, n_stall, ns_sig, n_ns = _branch_signals(sig, n, ok, start, length)
    st_s, sl_s = press_drans_batch(stall_sig, n_stall, tabs, emax, member=ok)
    st_n, sl_n = press_drans_batch(ns_sig, n_ns, tabs, emax, member=ok)
    use = ok & ((13 + sl_s + sl_n) < (5 + sl_p))
    useh = np.asarray(use)
    if useh.any() and (useh != okh).any():
        st_s, sl_s = press_drans_batch(stall_sig, n_stall, tabs, emax,
                                       member=use)
        st_n, sl_n = press_drans_batch(ns_sig, n_ns, tabs, emax, member=use)
    if useh.any():
        st_p, sl_p = press_drans_batch(sig, n, tabs, emax, member=~use)
    return _assemble(use, jnp.where(use, start, 0),
                     jnp.where(use, length, 0), st_s, sl_s, st_n, sl_n,
                     st_p, sl_p, L)


def depress_dstall_drans_batch(stream, n, tabs, L: int, emax: int = None):
    """Batched dstall_drans decode -> [B, L] int16."""
    B, M = stream.shape
    emax = emax or L
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    zero = jnp.zeros((B,), jnp.int32)
    use = jnp.take_along_axis(
        stream, jnp.zeros((B, 1), jnp.int32), axis=1
    )[:, 0].astype(jnp.int32) > 0
    start = jnp.where(use, read_u16le(stream, zero + 1).astype(jnp.int32), 0)
    length = jnp.where(use, read_u16le(stream, zero + 3).astype(jnp.int32), 0)
    stall_len = jnp.where(use, read_u32le(stream, zero + 5).astype(jnp.int32), 0)

    plain_stream = rowwise_shift_left(stream, zero + 5, M)
    d_plain = depress_drans_batch(plain_stream, n, tabs, L, emax=emax,
                                  member=~use)

    stall_stream = rowwise_shift_left(stream, zero + 9, M)
    d_stall = depress_drans_batch(stall_stream, jnp.maximum(length, 1), tabs,
                                  L, emax=emax, member=use)

    ns_off = jnp.where(use, 9 + stall_len + 4, 5)
    ns_stream = rowwise_shift_left(stream, ns_off, M)
    n_ns = jnp.maximum(n - length, 1)
    d_ns = depress_drans_batch(ns_stream, n_ns, tabs, L, emax=emax,
                               member=use)

    # re-interleave: ns values shift right by `length` from `start` on
    ns_valid = pos < n_ns[:, None]
    shift = jnp.where(pos >= start[:, None], length[:, None], 0)
    ns_grid, _ = monotone_expand(
        d_ns.astype(jnp.int32), jnp.where(ns_valid, shift, 0), ns_valid, L
    )
    stall_grid = rowwise_shift_right(d_stall.astype(jnp.int32), start, L)
    in_stall = (pos >= start[:, None]) & (pos < (start + length)[:, None])
    split_out = jnp.where(in_stall, stall_grid, ns_grid)
    out = jnp.where(use[:, None], split_out, d_plain.astype(jnp.int32))
    return jnp.where(pos < n[:, None], out, 0).astype(jnp.int16)
