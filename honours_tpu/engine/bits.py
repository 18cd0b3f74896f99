"""Batched bit-stream building blocks (pure 32-bit ops, TPU-safe).

Two bit orders exist in the framework's formats:
- MSB-first (the uintx bitpack family, press/press.c:285-397): stream bit
  p lives in byte p>>3 at in-byte position 7-(p&7).
- LSB-first (huffman/rice streams, press/huffman/huffman.c do_memory_encode):
  stream bit p lives in byte p>>3 at position p&7.

Both are built by scatter-adding 32-bit word contributions at computed bit
offsets (fields never span more than two words), then exploding words to
bytes in the matching endianness.  JAX runs in 32-bit mode on TPU, so all
shifts are explicit two-word splits.
"""

from __future__ import annotations

import jax.numpy as jnp

U32 = jnp.uint32


def _words_to_bytes_be(words: jnp.ndarray) -> jnp.ndarray:
    """[B, W] u32 -> [B, 4W] u8, big-endian byte order per word."""
    B, W = words.shape
    shifts = jnp.array([24, 16, 8, 0], dtype=U32).reshape(1, 1, 4)
    return (
        ((words[:, :, None] >> shifts) & jnp.uint32(0xFF))
        .astype(jnp.uint8)
        .reshape(B, 4 * W)
    )


def _words_to_bytes_le(words: jnp.ndarray) -> jnp.ndarray:
    """[B, W] u32 -> [B, 4W] u8, little-endian byte order per word."""
    B, W = words.shape
    shifts = jnp.array([0, 8, 16, 24], dtype=U32).reshape(1, 1, 4)
    return (
        ((words[:, :, None] >> shifts) & jnp.uint32(0xFF))
        .astype(jnp.uint8)
        .reshape(B, 4 * W)
    )


def scatter_bits_msb(values, bit_len, bit_off, valid, n_words: int):
    """Build an MSB-first bit stream.

    values [B, N] u32 (low `bit_len` bits used), bit_len [B, N] or [B, 1],
    bit_off [B, N] starting bit offsets, valid [B, N] mask.
    Returns bytes [B, 4*n_words] u8.
    """
    B, N = values.shape
    v = values.astype(U32)
    blen = jnp.broadcast_to(jnp.asarray(bit_len, jnp.int32), (B, N))
    word = (bit_off >> 5).astype(jnp.int32)
    inbit = (bit_off & 31).astype(jnp.int32)
    # MSB-first: field occupies word bits [31-inbit .. 31-inbit-blen+1]
    sh = 32 - inbit - blen
    pos_sh = jnp.clip(sh, 0, 31).astype(U32)
    neg_sh = jnp.clip(-sh, 0, 31).astype(U32)
    lo_sh = jnp.clip(32 + sh, 0, 31).astype(U32)
    w0 = jnp.where(sh >= 0, v << pos_sh, v >> neg_sh)
    w1 = jnp.where(sh >= 0, jnp.uint32(0), v << lo_sh)
    w0 = jnp.where(valid, w0, 0).astype(U32)
    w1 = jnp.where(valid, w1, 0).astype(U32)
    tgt0 = jnp.where(valid, word, n_words)
    tgt1 = jnp.where(valid & (sh < 0), word + 1, n_words)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    words = jnp.zeros((B, n_words + 1), dtype=U32)
    words = words.at[rows, tgt0].add(w0, mode="drop")
    words = words.at[rows, tgt1].add(w1, mode="drop")
    return _words_to_bytes_be(words[:, :n_words])


def scatter_bits_lsb(values, bit_len, bit_off, valid, n_words: int):
    """Build an LSB-first bit stream (huffman/rice order).

    Bit j of values[i] is stream bit bit_off[i] + j.
    """
    B, N = values.shape
    v = values.astype(U32)
    word = (bit_off >> 5).astype(jnp.int32)
    s = (bit_off & 31).astype(U32)
    w0 = v << s
    hi_sh = (jnp.uint32(32) - s) & jnp.uint32(31)
    w1 = jnp.where(s == 0, jnp.uint32(0), v >> hi_sh)
    w0 = jnp.where(valid, w0, 0).astype(U32)
    w1 = jnp.where(valid, w1, 0).astype(U32)
    rows = jnp.arange(B, dtype=jnp.int32)[:, None]
    tgt0 = jnp.where(valid, word, n_words)
    tgt1 = jnp.where(valid & (w1 != 0), word + 1, n_words)
    words = jnp.zeros((B, n_words + 1), dtype=U32)
    words = words.at[rows, tgt0].add(w0, mode="drop")
    words = words.at[rows, tgt1].add(w1, mode="drop")
    return _words_to_bytes_le(words[:, :n_words])


def gather_bits_msb(stream_bytes, bit_off, bit_len):
    """Read fields from an MSB-first bit stream.

    stream_bytes [B, M] u8, bit_off [B, N], bit_len [B, N] (<= 32).
    Returns [B, N] u32.
    """
    B, M = stream_bytes.shape
    s = stream_bytes.astype(U32)
    byte0 = (bit_off >> 3).astype(jnp.int32)

    def byte_at(idx):
        return jnp.take_along_axis(s, jnp.clip(idx, 0, M - 1), axis=1)

    # assemble 5 consecutive bytes -> up to 40 bits window
    acc_hi = jnp.zeros_like(bit_off).astype(U32)
    acc_lo = jnp.zeros_like(bit_off).astype(U32)
    # hi: bytes 0..3 big-endian, lo: byte 4 in top 8 bits of a second word
    b0 = byte_at(byte0)
    b1 = byte_at(byte0 + 1)
    b2 = byte_at(byte0 + 2)
    b3 = byte_at(byte0 + 3)
    b4 = byte_at(byte0 + 4)
    acc_hi = (b0 << 24) | (b1 << 16) | (b2 << 8) | b3
    acc_lo = b4 << 24
    r = (bit_off & 7).astype(U32)  # skip r leading bits
    # value = middle bit_len bits of the 40-bit window starting at r
    left = (acc_hi << r) | jnp.where(r == 0, 0, acc_lo >> ((32 - r) & 31))
    blen = jnp.asarray(bit_len, U32)
    out = jnp.where(blen == 0, 0, left >> ((32 - blen) & 31))
    return jnp.where(blen == 32, left, out).astype(U32)


def monotone_place(values, keep, targets, width: int):
    """Relocate kept elements to strictly-increasing target columns.

    Any strictly-increasing-target relocation decomposes as compact
    (pack kept left) followed by expand (rank r -> target[r], whose shift
    target-r is non-decreasing).  Returns (out [B, width], covered).
    """
    from honours_tpu.engine.permute import monotone_compact, monotone_expand

    B, N = values.shape
    vc, count = monotone_compact(values, keep)
    tc, _ = monotone_compact(jnp.where(keep, targets, 0), keep)
    if N > width:  # targets < width bound the kept count by width
        vc, tc = vc[:, :width], tc[:, :width]
        N = width
    rank = jnp.arange(N, dtype=jnp.int32)[None, :]
    valid = rank < count[:, None]
    shift = jnp.where(valid, tc - rank, 0)
    return monotone_expand(vc, shift, valid, width)


def pack_fields_msb(values, bit_len, bit_off, valid, n_words: int):
    """scatter_bits_msb semantics without XLA scatter.

    Fields' word contributions are OR-combined per target word with a
    segmented scan (bit_off is non-decreasing), then relocated with
    compact+expand.  Drop-in replacement for scatter_bits_msb on arrays
    large enough that XLA scatter (~100M elem/s) hurts.
    """
    from honours_tpu.engine.permute import monotone_compact, seg_or_scan

    B, N = values.shape
    v = values.astype(U32)
    blen = jnp.broadcast_to(jnp.asarray(bit_len, jnp.int32), (B, N))
    word = (bit_off >> 5).astype(jnp.int32)
    inbit = (bit_off & 31).astype(jnp.int32)
    sh = 32 - inbit - blen
    pos_sh = jnp.clip(sh, 0, 31).astype(U32)
    neg_sh = jnp.clip(-sh, 0, 31).astype(U32)
    lo_sh = jnp.clip(32 + sh, 0, 31).astype(U32)
    w0 = jnp.where(sh >= 0, v << pos_sh, v >> neg_sh)
    w1 = jnp.where(sh >= 0, jnp.uint32(0), v << lo_sh)
    w0 = jnp.where(valid, w0, 0).astype(U32)
    w1 = jnp.where(valid, w1, 0).astype(U32)
    seg = jnp.where(valid, word, n_words + 7)
    or0 = seg_or_scan(w0, seg)
    or1 = seg_or_scan(w1, seg)
    nxt = jnp.concatenate(
        [seg[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1
    )
    last = valid & (seg != nxt)

    words = jnp.zeros((B, n_words + 1), dtype=U32)
    placed0, cov0 = monotone_place(or0, last, seg, n_words + 1)
    placed1, cov1 = monotone_place(or1, last, seg + 1, n_words + 1)
    words = placed0 | placed1
    return _words_to_bytes_be(words[:, :n_words])


def pack_fields_lsb(values, bit_len, bit_off, valid, n_words: int):
    """scatter_bits_lsb semantics without XLA scatter (huffman/rice order).

    Same segmented-OR scheme as pack_fields_msb; bit j of values[i] is
    stream bit bit_off[i] + j, bytes little-endian per 32-bit word.
    """
    from honours_tpu.engine.permute import seg_or_scan

    B, N = values.shape
    v = values.astype(U32)
    word = (bit_off >> 5).astype(jnp.int32)
    s = (bit_off & 31).astype(U32)
    w0 = v << s
    hi_sh = (jnp.uint32(32) - s) & jnp.uint32(31)
    w1 = jnp.where(s == 0, jnp.uint32(0), v >> hi_sh)
    w0 = jnp.where(valid, w0, 0).astype(U32)
    w1 = jnp.where(valid, w1, 0).astype(U32)
    seg = jnp.where(valid, word, n_words + 7)
    or0 = seg_or_scan(w0, seg)
    or1 = seg_or_scan(w1, seg)
    nxt = jnp.concatenate(
        [seg[:, 1:], jnp.full((B, 1), -1, jnp.int32)], axis=1
    )
    last = valid & (seg != nxt)
    placed0, _ = monotone_place(or0, last, seg, n_words + 1)
    placed1, _ = monotone_place(or1, last, seg + 1, n_words + 1)
    return _words_to_bytes_le((placed0 | placed1)[:, :n_words])


def unpack_fields_msb(stream, base_byte, mb, count, N: int, mb_cap: int = 24):
    """Read `count` MSB-first fields of per-row width mb (<= mb_cap <= 24)
    starting at byte base_byte of each row.  Gather-free: stream bytes are
    relocated to the first field that uses them (compact+expand) and
    forward-filled across fields sharing a start byte.

    stream [B, M] u8; base_byte/mb/count [B].  Returns [B, N] u32.
    """
    from honours_tpu.engine.permute import (
        forward_fill,
        monotone_compact,
        monotone_expand,
        rowwise_shift_left,
    )

    B, M = stream.shape
    W = min(M, (N * mb_cap + 7) // 8 + 4)
    aligned = rowwise_shift_left(stream, base_byte, W + 3).astype(U32)
    # 4-byte big-endian window starting at each byte position
    win = (
        (aligned[:, :W] << 24)
        | (aligned[:, 1 : W + 1] << 16)
        | (aligned[:, 2 : W + 2] << 8)
        | aligned[:, 3 : W + 3]
    )
    mb = jnp.asarray(mb, jnp.int32).reshape(B, 1)
    mb_safe = jnp.maximum(mb, 1)
    nbyte = jnp.arange(W, dtype=jnp.int32)[None, :]
    first_i = (8 * nbyte + mb_safe - 1) // mb_safe
    is_start = ((first_i * mb_safe) >> 3) == nbyte
    is_start = is_start & (first_i < jnp.asarray(count, jnp.int32)[:, None])
    is_start = is_start & (mb > 0)

    # relocate window words to field positions, fill plateaus
    wc, cnt = monotone_compact(win, is_start)
    tc, _ = monotone_compact(jnp.where(is_start, first_i, 0), is_start)
    rank = jnp.arange(W, dtype=jnp.int32)[None, :]
    validc = rank < cnt[:, None]
    placed, covered = monotone_expand(
        wc, jnp.where(validc, tc - rank, 0), validc, max(N, W)
    )
    field_win = forward_fill(placed, covered)[:, :N]

    idx = jnp.arange(N, dtype=jnp.int32)[None, :]
    r = ((idx * mb) & 7).astype(U32)
    blen = jnp.broadcast_to(mb, (B, N)).astype(U32)
    out = jnp.where(
        blen == 0,
        0,
        (field_win >> (jnp.uint32(32) - r - blen))
        & ((jnp.uint32(1) << blen) - 1),
    )
    fvalid = idx < jnp.asarray(count, jnp.int32)[:, None]
    return jnp.where(fvalid, out, 0).astype(U32)


def rowwise_concat(segments, total_cols: int):
    """Concatenate variable-length row segments (gather-free).

    segments: list of (buf [B, Mi] u8, len [B] int32).  Returns
    (out [B, total_cols] u8, total_len [B]).
    """
    from honours_tpu.engine.permute import rowwise_concat as _rc

    return _rc(segments, total_cols)


def u32le_bytes(x) -> jnp.ndarray:
    """[B] int -> [B, 4] u8 little-endian."""
    x = jnp.asarray(x, U32)[:, None]
    shifts = jnp.array([0, 8, 16, 24], U32)[None, :]
    return ((x >> shifts) & jnp.uint32(0xFF)).astype(jnp.uint8)


def u16le_bytes(x) -> jnp.ndarray:
    x = jnp.asarray(x, U32)[:, None]
    shifts = jnp.array([0, 8], U32)[None, :]
    return ((x >> shifts) & jnp.uint32(0xFF)).astype(jnp.uint8)


def u32be_bytes(x) -> jnp.ndarray:
    x = jnp.asarray(x, U32)[:, None]
    shifts = jnp.array([24, 16, 8, 0], U32)[None, :]
    return ((x >> shifts) & jnp.uint32(0xFF)).astype(jnp.uint8)


def read_u32le(stream, off):
    """stream [B, M] u8, off [B] -> [B] u32."""
    M = stream.shape[1]

    def b(i):
        return jnp.take_along_axis(
            stream, jnp.clip(off[:, None] + i, 0, M - 1), axis=1
        )[:, 0].astype(U32)

    return b(0) | (b(1) << 8) | (b(2) << 16) | (b(3) << 24)


def read_u16le(stream, off):
    M = stream.shape[1]

    def b(i):
        return jnp.take_along_axis(
            stream, jnp.clip(off[:, None] + i, 0, M - 1), axis=1
        )[:, 0].astype(U32)

    return b(0) | (b(1) << 8)
