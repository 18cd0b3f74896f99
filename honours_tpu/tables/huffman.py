"""Huffman code tables: construction, (de)serialization, canned NA12878 table.

Code representation: for each byte symbol s, `lengths[s]` bits and
`codes[s]` where bit j (1 << j) is the j-th emitted bit — matching the
reference's LSB-first bit order both in serialized code bytes
(huffman.c:24-31 get_bit) and in the encoded stream (huffman.c do_memory_encode,
decode mask walk huffman.c:1248-1260).

Serialized table formats (reference: press/huffman/huffman.c:426-480 file
format used by NA12878_zd.huffman; :483-540 the in-memory variant whose
count field is a single byte equal to n_entries-1 mod 256):

  file:   [count:u32 BE][dataBytes:u32 BE]([sym:1B][numbits:1B][code bytes])*
  memory: [count-1:1B ][dataBytes:u32 BE]([sym:1B][numbits:1B][code bytes])*

Tree construction replicates calculate_huffman_codes
(huffman.c:373-424): stable sort of symbol-ordered leaves by count,
repeatedly merging the two least-frequent subtrees (zero=first, one=second).
glibc qsort is mergesort (stable) at this size, so a stable sort reproduces
the reference's exact codes — verified against the golden streams.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from honours_tpu.tables.na12878_freq import NA12878_ZD_FREQ  # noqa: F401

MAX_SYMBOLS = 256


@dataclass
class HuffmanTable:
    lengths: np.ndarray  # [256] int32
    codes: np.ndarray  # [256] uint64, LSB-first emitted bits
    present_mask: np.ndarray = None  # [256] bool; length 0 + present is the
    # degenerate single-symbol code (reference emits a numbits=0 entry)

    def __post_init__(self):
        if self.present_mask is None:
            self.present_mask = self.lengths > 0

    @property
    def max_len(self) -> int:
        return int(self.lengths.max())

    def present(self) -> np.ndarray:
        return np.nonzero(self.present_mask)[0]


def build_table(freq) -> HuffmanTable:
    """Deterministic replica of the reference tree build (huffman.c:373-424)."""
    freq = np.asarray(freq, dtype=np.uint64)
    # node: (count, id, payload); payload = symbol int or (zero, one)
    nodes = [(int(freq[s]), s, s) for s in range(MAX_SYMBOLS) if freq[s] > 0]
    if not nodes:
        return HuffmanTable(
            np.zeros(MAX_SYMBOLS, np.int32), np.zeros(MAX_SYMBOLS, np.uint64)
        )
    items = [(c, payload) for c, _s, payload in nodes]
    while len(items) > 1:
        items.sort(key=lambda t: t[0])  # stable, like glibc mergesort qsort
        (c1, p1), (c2, p2) = items[0], items[1]
        items = [(c1 + c2, (p1, p2))] + items[2:]
    lengths = np.zeros(MAX_SYMBOLS, np.int32)
    codes = np.zeros(MAX_SYMBOLS, np.uint64)

    def walk(payload, code: int, depth: int):
        if isinstance(payload, tuple):
            walk(payload[0], code, depth + 1)  # zero branch
            walk(payload[1], code | (1 << depth), depth + 1)  # one branch
        else:
            lengths[payload] = depth
            codes[payload] = code

    walk(items[0][1], 0, 0)
    return HuffmanTable(lengths, codes, freq > 0)


def _entries_bytes(table: HuffmanTable) -> bytes:
    out = []
    for s in table.present():
        nb = int(table.lengths[s])
        nbytes = (nb + 7) // 8
        code = int(table.codes[s])
        out.append(bytes([s, nb]) + code.to_bytes(nbytes, "little"))
    return b"".join(out)


def serialize_file(table: HuffmanTable, data_bytes: int) -> bytes:
    n = table.present().size
    return struct.pack(">II", n, data_bytes) + _entries_bytes(table)


def serialize_memory(table: HuffmanTable, data_bytes: int) -> bytes:
    n = table.present().size
    return bytes([(n - 1) & 0xFF]) + struct.pack(">I", data_bytes) + _entries_bytes(
        table
    )


def _parse_entries(buf: bytes, off: int, n: int) -> HuffmanTable:
    lengths = np.zeros(MAX_SYMBOLS, np.int32)
    codes = np.zeros(MAX_SYMBOLS, np.uint64)
    present = np.zeros(MAX_SYMBOLS, bool)
    for _ in range(n):
        sym = buf[off]
        nb = buf[off + 1]
        off += 2
        nbytes = (nb + 7) // 8
        codes[sym] = int.from_bytes(buf[off : off + nbytes], "little")
        lengths[sym] = nb
        present[sym] = True
        off += nbytes
    return HuffmanTable(lengths, codes, present), off


def parse_file(buf: bytes):
    """Returns (table, data_bytes)."""
    n, data_bytes = struct.unpack_from(">II", buf, 0)
    table, _ = _parse_entries(buf, 8, n)
    return table, data_bytes


def parse_memory(buf: bytes):
    """Returns (table, data_bytes, header_len)."""
    n = buf[0] + 1
    (data_bytes,) = struct.unpack_from(">I", buf, 1)
    if data_bytes == 0:
        # empty input: the reference emits no entries here (count byte wraps
        # to 0xFF); its own decoder would mis-read — we stop cleanly instead
        return (
            HuffmanTable(
                np.zeros(MAX_SYMBOLS, np.int32), np.zeros(MAX_SYMBOLS, np.uint64)
            ),
            0,
            5,
        )
    table, off = _parse_entries(buf, 5, n)
    return table, data_bytes, off


_CANNED = None


def na12878_table() -> HuffmanTable:
    """The canned NA12878 zigzag-delta static table
    (reference: press/NA12878_zd.huffman, generated by press/gen_huffman.c)."""
    global _CANNED
    if _CANNED is None:
        path = Path(__file__).parent / "NA12878_zd.huffman"
        _CANNED, _ = parse_file(path.read_bytes())
    return _CANNED
