"""Stream-VByte kernels (numpy host path).

Three wire formats, all `[key section][data section]`:

- svb32 "1234": 2-bit codes = nbytes-1, 4 codes/byte LSB-first, key
  section ceil(n/4) bytes, little-endian value bytes
  (reference: press/streamvbyte/src/streamvbyte_encode.c:36-60).
- svb32 "0124": 2-bit codes with lengths {0,1,2,4}
  (reference: press/streamvbyte/src/streamvbyte_0124_encode.c:8-28).
- svb16 "12": 1-bit codes (1 or 2 bytes), 8 codes/byte LSB-first, key
  section ceil(n/8) bytes (reference: press/svb16/encode_scalar.c:11-56,
  press/streamvbyte/src/streamvbyte_12_encode.c:26-55 — identical format).

These are two-phase length/prefix-sum/scatter algorithms — the shape the
TPU engines mirror in jit.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "svb32_encode",
    "svb32_decode",
    "svb0124_encode",
    "svb0124_decode",
    "svb16_encode",
    "svb16_decode",
    "svb16_max_encoded_length",
]


def _pack_codes_2bit(codes: np.ndarray) -> np.ndarray:
    n = codes.size
    keylen = (n + 3) // 4
    p = np.zeros(keylen * 4, dtype=np.uint8)
    p[:n] = codes
    p = p.reshape(-1, 4)
    return (p[:, 0] | (p[:, 1] << 2) | (p[:, 2] << 4) | (p[:, 3] << 6)).astype(
        np.uint8
    )


def _unpack_codes_2bit(keys: np.ndarray, n: int) -> np.ndarray:
    codes = np.zeros(keys.size * 4, dtype=np.uint8)
    codes[0::4] = keys & 3
    codes[1::4] = (keys >> 2) & 3
    codes[2::4] = (keys >> 4) & 3
    codes[3::4] = (keys >> 6) & 3
    return codes[:n]


def _scatter_le_bytes(v: np.ndarray, nbytes: np.ndarray) -> np.ndarray:
    """Emit the low `nbytes[i]` little-endian bytes of each v[i]."""
    ends = np.cumsum(nbytes)
    offs = ends - nbytes
    data = np.zeros(int(ends[-1]) if ends.size else 0, dtype=np.uint8)
    for k in range(4):
        m = nbytes > k
        if not m.any():
            break
        data[offs[m] + k] = ((v[m] >> (8 * k)) & 0xFF).astype(np.uint8)
    return data


def svb32_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint32)
    n = v.size
    if n == 0:
        return b""
    nbytes = np.ones(n, dtype=np.int64)
    nbytes[v >= (1 << 8)] = 2
    nbytes[v >= (1 << 16)] = 3
    nbytes[v >= (1 << 24)] = 4
    keys = _pack_codes_2bit((nbytes - 1).astype(np.uint8))
    return keys.tobytes() + _scatter_le_bytes(v, nbytes).tobytes()


def svb32_decode(buf, n: int) -> tuple:
    """Returns (values u32, bytes consumed)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint32), 0
    buf = np.frombuffer(buf, dtype=np.uint8)
    keylen = (n + 3) // 4
    nbytes = _unpack_codes_2bit(buf[:keylen], n).astype(np.int64) + 1
    ends = np.cumsum(nbytes)
    offs = ends - nbytes
    total = int(ends[-1])
    data = buf[keylen : keylen + total]
    v = data[offs].astype(np.uint32)
    for k in range(1, 4):
        m = nbytes > k
        if not m.any():
            break
        v[m] |= data[offs[m] + k].astype(np.uint32) << (8 * k)
    return v, keylen + total


def svb0124_encode(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.uint32)
    n = v.size
    if n == 0:
        return b""
    nbytes = np.zeros(n, dtype=np.int64)
    nbytes[v >= 1] = 1
    nbytes[v >= (1 << 8)] = 2
    nbytes[v >= (1 << 16)] = 4
    codes = np.zeros(n, dtype=np.uint8)
    codes[v >= 1] = 1
    codes[v >= (1 << 8)] = 2
    codes[v >= (1 << 16)] = 3
    keys = _pack_codes_2bit(codes)
    return keys.tobytes() + _scatter_le_bytes(v, nbytes).tobytes()


def svb0124_decode(buf, n: int) -> tuple:
    if n == 0:
        return np.zeros(0, dtype=np.uint32), 0
    buf = np.frombuffer(buf, dtype=np.uint8)
    keylen = (n + 3) // 4
    codes = _unpack_codes_2bit(buf[:keylen], n)
    nbytes = np.array([0, 1, 2, 4], dtype=np.int64)[codes]
    ends = np.cumsum(nbytes)
    offs = ends - nbytes
    total = int(ends[-1]) if ends.size else 0
    data = buf[keylen : keylen + total]
    v = np.zeros(n, dtype=np.uint32)
    for k in range(4):
        m = nbytes > k
        if not m.any():
            break
        v[m] |= data[offs[m] + k].astype(np.uint32) << (8 * k)
    return v, keylen + total


def svb16_key_length(n: int) -> int:
    return (n >> 3) + (((n & 7) + 7) >> 3)


def svb16_max_encoded_length(n: int) -> int:
    return svb16_key_length(n) + 2 * n


def svb16_encode(values: np.ndarray) -> bytes:
    """1-or-2-byte svb over uint16 values (keys 1 bit/value LSB-first)."""
    v = np.ascontiguousarray(values, dtype=np.uint16)
    n = v.size
    if n == 0:
        return b""
    two = v >= (1 << 8)
    keylen = svb16_key_length(n)
    bits = np.zeros(keylen * 8, dtype=np.uint8)
    bits[:n] = two
    keys = np.packbits(bits, bitorder="little")
    nbytes = two.astype(np.int64) + 1
    return keys.tobytes() + _scatter_le_bytes(v.astype(np.uint32), nbytes).tobytes()


def svb16_decode(buf, n: int) -> tuple:
    """Returns (values u16, bytes consumed)."""
    if n == 0:
        return np.zeros(0, dtype=np.uint16), 0
    buf = np.frombuffer(buf, dtype=np.uint8)
    keylen = svb16_key_length(n)
    two = np.unpackbits(buf[:keylen], bitorder="little")[:n].astype(bool)
    nbytes = two.astype(np.int64) + 1
    ends = np.cumsum(nbytes)
    offs = ends - nbytes
    total = int(ends[-1])
    data = buf[keylen : keylen + total]
    v = data[offs].astype(np.uint16)
    v[two] |= data[offs[two] + 1].astype(np.uint16) << 8
    return v, keylen + total
