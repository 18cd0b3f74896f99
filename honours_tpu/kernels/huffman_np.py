"""Huffman bit-stream encode/decode (numpy host path).

Encode is the two-phase shape the TPU engine mirrors: per-symbol code
lengths -> exclusive prefix sum of bit offsets -> scatter code bits
LSB-first into the output bytes (reference bit order:
press/huffman/huffman.c do_memory_encode).

Decode walks a (window -> first symbol, length) LUT; symbols are decoded
one per step, parallel across streams in the TPU engine.
"""

from __future__ import annotations

import numpy as np

from honours_tpu.tables.huffman import HuffmanTable


def huffman_encode(data: np.ndarray, table: HuffmanTable) -> bytes:
    """Encode bytes -> LSB-first bit stream (no header)."""
    d = np.asarray(data, dtype=np.uint8)
    lens = table.lengths[d].astype(np.int64)
    offs = np.cumsum(lens) - lens
    total = int(lens.sum()) if lens.size else 0
    bits = np.zeros((total + 7) // 8 * 8, dtype=np.uint8)
    codes = table.codes[d]
    for j in range(table.max_len):
        m = lens > j
        if not m.any():
            break
        bits[offs[m] + j] = ((codes[m] >> np.uint64(j)) & np.uint64(1)).astype(
            np.uint8
        )
    return np.packbits(bits, bitorder="little").tobytes()


def make_decode_lut(table: HuffmanTable, width: int = None):
    """LUT over `width`-bit windows -> (symbol, code length).

    Requires width >= max code length.  LSB-first: window bit 0 is the
    first stream bit.
    """
    width = width or table.max_len
    assert width >= table.max_len <= 64
    sym_lut = np.zeros(1 << width, dtype=np.uint8)
    len_lut = np.zeros(1 << width, dtype=np.uint8)
    for s in table.present():
        L = int(table.lengths[s])
        code = int(table.codes[s])
        # all windows whose low L bits == code
        n_fill = 1 << (width - L)
        idx = code + (np.arange(n_fill, dtype=np.int64) << L)
        sym_lut[idx] = s
        len_lut[idx] = L
    return sym_lut, len_lut


def huffman_decode(stream: bytes, n: int, table: HuffmanTable) -> np.ndarray:
    """Decode n symbols from an LSB-first bit stream (native LUT walk)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint8)
    if table.max_len == 0:
        # degenerate single-symbol table: zero-bit codes
        return np.full(n, table.present()[0], dtype=np.uint8)
    if table.max_len > 24:
        return _huffman_decode_bitwalk(stream, n, table)
    luts = getattr(table, "_decode_lut", None)
    if luts is None:
        luts = make_decode_lut(table)
        table._decode_lut = luts
    sym_lut, len_lut = luts
    from honours_tpu import native

    return native.huffman_decode_lut(stream, n, sym_lut, len_lut, table.max_len)


def _huffman_decode_bitwalk(stream: bytes, n: int, table: HuffmanTable):
    """Fallback for pathologically deep dynamic tables (> 24-bit codes)."""
    # first-match decode against (len, code) pairs, LSB-first
    pairs = [(int(table.lengths[s]), int(table.codes[s]), s) for s in table.present()]
    pairs.sort()
    out = np.empty(n, dtype=np.uint8)
    buf = 0
    nbits = 0
    pos = 0
    data = stream + b"\x00" * 16
    for i in range(n):
        while nbits < 64 and pos < len(data):
            buf |= data[pos] << nbits
            pos += 1
            nbits += 8
        for L, code, s in pairs:
            if (buf & ((1 << L) - 1)) == code:
                out[i] = s
                buf >>= L
                nbits -= L
                break
        else:
            raise ValueError("huffman stream corrupt")
    return out
