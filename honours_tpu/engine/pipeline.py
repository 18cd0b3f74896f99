"""Flagship batched pipelines: zd -> vbbe21 -> {static huffman | static rANS}.

Byte-identical to the serial codecs `shuffman_vbbe21_zd` (encode) and
`srans_vbbe21_zd` (encode+decode), so the host and TPU sides interoperate
freely.  Reads enter as a padded [B, L] int16 batch with a length vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.bits import rowwise_concat, u16le_bytes
from honours_tpu.engine.entropy import (
    make_tables,
    rans_decode_batch,
    rans_encode_batch,
    shuff_encode_batch,
)
from honours_tpu.engine.entropy_o1 import rans_o1_decode_batch, rans_o1_encode_batch
from honours_tpu.engine.vbbe21 import (
    vbbe21_fill_batch,
    vbbe21_parse_batch,
    vbbe21_parts_batch,
)
from honours_tpu.kernels.rans import K_SHARED
from honours_tpu.transforms.core import jnp_unzigdelta, jnp_zigdelta


def _zd_parts(sig, n):
    """zigzag-delta then split first value vs rest (vb operates on zd[1:])."""
    B, L = sig.shape
    zd = jnp_zigdelta(sig)
    zd0 = zd[:, 0]
    rest = jnp.concatenate([zd[:, 1:], jnp.zeros((B, 1), zd.dtype)], axis=1)
    return zd0, rest


@functools.partial(jax.jit, static_argnames=("emax",))
def press_srans_batch(sig, n, freqs, cum, emax: int = None):
    """Batched srans_vbbe21_zd encode -> (stream [B, M] u8, len [B]).

    `emax` statically caps the exception buffers (real nanopore zd data
    has ~1% exceptions; L/16 is a comfortable production cap that
    shrinks every buffer-width-bound stage).  Rows with more exceptions
    than emax produce invalid streams — verify via nex or round-trip
    when capping.  Default None = L (always safe).
    """
    B, L = sig.shape
    emax = emax or L
    zd0, rest = _zd_parts(sig, n)
    parts = vbbe21_parts_batch(rest, n - 1, emax)
    body, body_len = rans_encode_batch(parts["data"], parts["data_len"], freqs, cum)
    segs = (
        [(u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32))]
        + parts["exsegs"]
        + [(body, body_len)]
    )
    total = 2 + 4 + (4 + 4 * emax + 1) + (4 + 2 * emax + 1) + 6 + body.shape[1]
    return rowwise_concat(segs, total)


@functools.partial(jax.jit, static_argnames=("L", "K", "emax"))
def depress_srans_batch(stream, n, freqs, cum, L: int,
                        K: int = K_SHARED, emax: int = None):
    """Batched srans_vbbe21_zd decode -> [B, L] int16."""
    from honours_tpu.engine.bits import read_u16le

    B, Mb = stream.shape
    zd0 = read_u16le(stream, jnp.zeros((B,), jnp.int32))
    # exception block starts at byte 2; parse it once to locate the
    # entropy body, decode the body, then merge.
    parsed = vbbe21_parse_batch(
        stream, jnp.full((B,), 2, jnp.int32), n - 1, L, emax
    )
    data = rans_decode_batch(
        stream, parsed["end_off"], n - 1 - parsed["nex"], freqs, cum, L, K
    )
    vals = vbbe21_fill_batch(parsed, data, n - 1, L)
    return _zd_merge(zd0, vals, n, L)


def _zd_merge(zd0, vals, n, L: int):
    """Reassemble [zd0, vals[:n-1]] and invert the zigzag-delta."""
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    zd = jnp.concatenate(
        [zd0[:, None].astype(jnp.int32), vals[:, : L - 1]], axis=1
    )
    zd = jnp.where(pos < n[:, None], zd, 0)
    out = jnp_unzigdelta(zd)
    return jnp.where(pos < n[:, None], out, 0).astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("emax",))
def _assemble_srans(zd0, parts, body, body_len, emax: int):
    """[zd0][vbbe21 ex block][entropy body] with the shared width bound."""
    B = zd0.shape[0]
    segs = (
        [(u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32))]
        + parts["exsegs"]
        + [(body, body_len)]
    )
    total = 2 + 4 + (4 + 4 * emax + 1) + (4 + 2 * emax + 1) + 6 + body.shape[1]
    return rowwise_concat(segs, total)


def _assemble_srans_parts(zd0, parts, segs_body, body_width: int, emax: int):
    """Same as _assemble_srans but the entropy body arrives as concat
    segments (last one sparse), so its compaction rides THIS walk."""
    B = zd0.shape[0]
    segs = (
        [(u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32))]
        + parts["exsegs"]
        + segs_body
    )
    total = (2 + 4 + (4 + 4 * emax + 1) + (4 + 2 * emax + 1) + 6
             + body_width)
    return rowwise_concat(segs, total)


@functools.partial(jax.jit, static_argnames=("emax",))
def press_srans2_batch(sig, n, tabs, emax: int = None):
    """Batched srans2_vbbe21_zd (order-1) encode -> (stream, len).

    `tabs` from entropy_o1.make_o1_tables (use canned_o1_device_tables).
    Byte-exact with the host codec per row, including ragged lengths
    (the engine emits the same per-row S = ceil(data_len/K) header).
    """
    from honours_tpu.engine.entropy_o1 import rans_o1_encode_parts

    B, L = sig.shape
    emax = emax or L
    zd0, rest = _zd_parts(sig, n)
    parts = vbbe21_parts_batch(rest, n - 1, emax)
    segs_body, planew = rans_o1_encode_parts(
        parts["data"], parts["data_len"], tabs
    )
    return _assemble_srans_parts(
        zd0, parts, segs_body, 4 + 4 * K_SHARED + planew, emax
    )


@functools.partial(jax.jit, static_argnames=("L", "K", "emax"))
def depress_srans2_batch(stream, n, tabs, L: int,
                         K: int = K_SHARED, emax: int = None):
    """Batched srans2_vbbe21_zd decode -> [B, L] int16."""
    from honours_tpu.engine.bits import read_u16le

    B, Mb = stream.shape
    zd0 = read_u16le(stream, jnp.zeros((B,), jnp.int32))
    parsed = vbbe21_parse_batch(
        stream, jnp.full((B,), 2, jnp.int32), n - 1, L, emax
    )
    data = rans_o1_decode_batch(
        stream, parsed["end_off"], n - 1 - parsed["nex"], tabs, L, K
    )
    vals = vbbe21_fill_batch(parsed, data, n - 1, L)
    return _zd_merge(zd0, vals, n, L)


@functools.partial(jax.jit, static_argnames=("emax",))
def press_srans3_batch(sig, n, tabs, emax: int = None):
    """Batched srans3_vbbe21_zd (nibble order-1) encode -> (stream, len).

    `tabs` from entropy_o1n.make_o1n_tables (use canned_o1n_device_tables).
    Byte-exact with the host codec per row.
    """
    from honours_tpu.engine.entropy_o1n import rans_o1n_encode_batch

    B, L = sig.shape
    emax = emax or L
    zd0, rest = _zd_parts(sig, n)
    parts = vbbe21_parts_batch(rest, n - 1, emax)
    body, body_len = rans_o1n_encode_batch(parts["data"], parts["data_len"], tabs)
    segs = (
        [(u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32))]
        + parts["exsegs"]
        + [(body, body_len)]
    )
    total = 2 + 4 + (4 + 4 * emax + 1) + (4 + 2 * emax + 1) + 6 + body.shape[1]
    return rowwise_concat(segs, total)


@functools.partial(jax.jit, static_argnames=("L", "K", "emax"))
def depress_srans3_batch(stream, n, tabs, L: int,
                         K: int = K_SHARED, emax: int = None):
    """Batched srans3_vbbe21_zd decode -> [B, L] int16."""
    from honours_tpu.engine.bits import read_u16le
    from honours_tpu.engine.entropy_o1n import rans_o1n_decode_batch

    B, Mb = stream.shape
    zd0 = read_u16le(stream, jnp.zeros((B,), jnp.int32))
    parsed = vbbe21_parse_batch(
        stream, jnp.full((B,), 2, jnp.int32), n - 1, L, emax
    )
    data = rans_o1n_decode_batch(
        stream, parsed["end_off"], n - 1 - parsed["nex"], tabs, L, K
    )
    vals = vbbe21_fill_batch(parsed, data, n - 1, L)
    return _zd_merge(zd0, vals, n, L)


@functools.partial(jax.jit, static_argnames=())
def press_shuff_batch(sig, n, lengths, codes):
    """Batched shuffman_vbbe21_zd encode -> (stream [B, M] u8, len [B])."""
    B, L = sig.shape
    zd0, rest = _zd_parts(sig, n)
    parts = vbbe21_parts_batch(rest, n - 1)
    blob, blob_len = shuff_encode_batch(
        parts["data"], parts["data_len"], lengths, codes
    )
    segs = (
        [(u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32))]
        + parts["exsegs"]
        + [(blob, blob_len)]
    )
    total = 2 + 4 + (4 + 4 * L + 1) + (4 + 2 * L + 1) + 6 + blob.shape[1]
    return rowwise_concat(segs, total)


# ---------------------------------------------------------------------------
# host-facing helpers
# ---------------------------------------------------------------------------


def canned_rans_tables():
    from honours_tpu.codecs.srans import canned_freqs

    return make_tables(canned_freqs())


def canned_o1_device_tables():
    from honours_tpu.engine.entropy_o1 import make_o1_tables
    from honours_tpu.tables.o1 import canned_o1_freqs

    return make_o1_tables(canned_o1_freqs())


def canned_o1n_device_tables():
    from honours_tpu.engine.entropy_o1n import canned_o1n_device_tables as f

    return f()


def canned_huffman_tables():
    from honours_tpu.tables.huffman import na12878_table

    t = na12878_table()
    return jnp.asarray(t.lengths, jnp.int32), jnp.asarray(
        t.codes.astype(np.uint32), jnp.uint32
    )


def pad_batch(signals, L=None):
    """Pack a list of int16 reads into ([B, L] int16, lengths [B])."""
    L = L or max(s.size for s in signals)
    L = -(-L // 8) * 8
    B = len(signals)
    sig = np.zeros((B, L), dtype=np.int16)
    n = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(signals):
        sig[i, : s.size] = s
        n[i] = s.size
    return jnp.asarray(sig), jnp.asarray(n)
