"""Batched TPU Golomb-Rice encode (rice_vb*_zd family).

The reference's rice coder (press/press.c:4854-5391) emits, per residual
byte v: q = v>>k ones, a zero, then k value bits MSB-first, LSB-first
within stream bytes, after a 3-bit k header.  The TPU formulation
(SURVEY §2.2 item 8): per-value code lengths -> prefix-sum bit offsets ->
ONE pack_fields_lsb pass.  Unary runs of ones are never materialized as
fields: the stream is all-ones over [0, total_bits) XOR a per-value
correction field of 1+k bits at the terminator position (value
[0, rev_k(v)] inverted), so arbitrary-length runs cost nothing.

Byte-exact with codecs.rice.rice_encode per row.  Decode stays on the
host codec: a rice stream is ONE serial bit stream per read with
data-dependent record lengths — no interleaving to vectorize over (the
runner reports the fallback explicitly).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from honours_tpu.engine.bits import pack_fields_lsb, rowwise_concat, u16le_bytes
from honours_tpu.engine.vb_batch import (
    _ex_parts,
    _svb_exblock_parts,
    _u16_grid_bytes,
    _u32_grid_bytes,
    _zd_head,
    u32le_bytes,
)

U32 = jnp.uint32


def rice_encode_batch(data, dlen):
    """[B, N] u8-valued i32 + lengths -> (blob [B, Mw] u8, blob_len [B]).

    Byte-exact with codecs.rice.rice_encode(data[:dlen]) per row
    (including the zero padding of the final byte's unused bits).
    """
    B, N = data.shape
    pos = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = pos < dlen[:, None]
    v = jnp.where(valid, data.astype(jnp.int32), 0)

    # k in [0,8) minimizing sum(v>>k) + n*(1+k); first-min on ties
    sizes = jnp.stack(
        [jnp.sum(v >> k, axis=1) + dlen * (1 + k) for k in range(8)]
    )  # [8, B]
    k = jnp.argmin(sizes, axis=0).astype(jnp.int32)[:, None]  # [B, 1]

    q = v >> k
    lens = jnp.where(valid, q + 1 + k, 0)
    ends = 3 + jnp.cumsum(lens, axis=1)
    offs = ends - lens
    total_bits = ends[:, -1]

    # rev_k(v): low k bits of v reversed (value bits are MSB-first)
    rev = jnp.zeros_like(v)
    for j in range(7):
        sh = jnp.clip(k - 1 - j, 0, 31)
        rev = rev | jnp.where(j < k, ((v >> j) & 1) << sh, 0)
    corr = (rev << 1) ^ ((1 << (1 + k)) - 1)  # field [0, rev bits] inverted

    # 3-bit k header at stream bits 0..2: k2, k1, k0
    hdr_d = ((k >> 2) & 1) | (((k >> 1) & 1) << 1) | ((k & 1) << 2)
    hdr = hdr_d ^ 7

    vals = jnp.concatenate([hdr, corr], axis=1)
    flens = jnp.concatenate(
        [jnp.full((B, 1), 3, jnp.int32), jnp.broadcast_to(1 + k, (B, N))],
        axis=1,
    )
    foffs = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), offs + q], axis=1)
    fvalid = jnp.concatenate([jnp.ones((B, 1), bool), valid], axis=1)

    n_words = (9 * N + 3 + 31) // 32 + 1
    corr_bytes = pack_fields_lsb(
        vals.astype(U32), flens, foffs, fvalid, n_words
    )

    w = jnp.arange(n_words, dtype=jnp.int32)[None, :]
    full = (w + 1) * 32 <= total_bits[:, None]
    part = (total_bits[:, None] >> 5) == w
    rem = (total_bits[:, None] & 31).astype(U32)
    ones_words = jnp.where(
        full,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(part, (jnp.uint32(1) << rem) - 1, jnp.uint32(0)),
    )
    sh = jnp.array([0, 8, 16, 24], U32).reshape(1, 1, 4)
    ones_bytes = (
        ((ones_words[:, :, None] >> sh) & jnp.uint32(0xFF))
        .astype(jnp.uint8)
        .reshape(B, 4 * n_words)
    )
    return ones_bytes ^ corr_bytes, (total_bits + 7) // 8


def _exblock_segs(kind: str, rest, n1, emax: int):
    """(segs, data, data_len) for the vb exception block of `kind`."""
    B = rest.shape[0]
    if kind == "vbbe21":
        from honours_tpu.engine.vbbe21 import vbbe21_parts_batch

        p = vbbe21_parts_batch(rest, n1, emax)
        return p["exsegs"], p["data"], p["data_len"]
    p = _ex_parts(rest, n1, emax)
    if kind == "vbe21":
        segs = [
            (u32le_bytes(p["nex"]), jnp.full((B,), 4, jnp.int32)),
            (_u32_grid_bytes(p["ex_pos"]), 4 * p["nex"]),
            (_u16_grid_bytes(p["ex_val"]), 2 * p["nex"]),
        ]
    else:
        segs, _ = _svb_exblock_parts(p, emax, val_svb=(kind == "vbsse21"))
    return segs, p["data"], p["data_len"]


@functools.partial(jax.jit, static_argnames=("kind", "emax"))
def press_rice_vb_zd_batch(sig, n, kind: str, emax: int = None):
    """Batched rice_<kind>_zd encode -> (stream [B, M] u8, len [B])."""
    B, L = sig.shape
    emax = emax or L
    zd0, rest = _zd_head(sig, n)
    segs, data, data_len = _exblock_segs(kind, rest, n - 1, emax)
    blob, blob_len = rice_encode_batch(data, data_len)
    segs = (
        [(u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32))]
        + segs
        + [(blob, blob_len)]
    )
    total = 2 + 32 + 7 * emax + blob.shape[1]
    return rowwise_concat(segs, total)
