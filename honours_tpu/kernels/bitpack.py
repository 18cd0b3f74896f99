"""n-bit big-endian (MSB-first) bit packing — the `uintx` kernel.

The reference packs each value's low `b` bits MSB-first into a contiguous
bit stream, final partial byte zero-padded in its low bits
(reference: press/press.c:285-397 uintx_press_core; worked example in the
block comment at press/press.c:288-320).

numpy path: bit-matrix expansion + packbits (vectorized, exact).
jax path: batched fixed-shape variant used by the TPU codec engines —
per-row dynamic bit width handled by gathering from a per-value 16/32-bit
MSB-first bit tensor.
"""

from __future__ import annotations

import numpy as np

__all__ = ["pack_bits", "unpack_bits", "minbits"]


def minbits(max_value: int) -> int:
    """Smallest b with max_value < 2**b (press/press.c:461-471)."""
    return int(max_value).bit_length()


def pack_bits(values: np.ndarray, b: int) -> bytes:
    """Pack each value's low b bits MSB-first; returns the byte stream."""
    v = np.asarray(values)
    n = v.size
    if b == 0 or n == 0:
        return b""
    v = v.astype(np.uint64)
    shifts = np.arange(b - 1, -1, -1, dtype=np.uint64)
    bits = ((v[:, None] >> shifts[None, :]) & 1).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()  # packbits pads with 0s


def unpack_bits(stream: bytes, b: int, n: int, dtype=np.uint16) -> np.ndarray:
    """Unpack n MSB-first b-bit fields from the byte stream."""
    if b == 0 or n == 0:
        return np.zeros(n, dtype=dtype)
    bits = np.unpackbits(np.frombuffer(stream, dtype=np.uint8), count=n * b)
    bits = bits.reshape(n, b).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(b - 1, -1, -1, dtype=np.uint64))
    return (bits * weights).sum(axis=1).astype(dtype)
