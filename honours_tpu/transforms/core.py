"""Signal transforms: zigzag, delta, zigzag-delta, shift, qts.

Bit-exact re-implementations of the reference transform layer
(reference: press/trans.c) with both numpy (host/serial) and jax.numpy
(batched TPU) entry points.  All arithmetic is performed in uint16 space
so int16 wraparound matches C semantics exactly
(reference: press/trans.c:75-83 zigzag, :215-230 zigzag-delta,
press/svb16/encode_scalar.c:31 unsigned-wrap delta).

Encode direction is a pure elementwise map plus a shifted subtraction;
decode undelta is a prefix sum (jax.lax.associative_scan-compatible:
jnp.cumsum), which is the TPU-native formulation of the serial C loops.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "zigzag16",
    "unzigzag16",
    "zigdelta",
    "unzigdelta",
    "delta_u16",
    "undelta_u16",
    "delta_increasing_u32",
    "undelta_increasing_u32",
    "find_qts",
    "qts_shift",
    "qts_unshift",
    "jnp_zigdelta",
    "jnp_unzigdelta",
]


def _as_u16(x) -> np.ndarray:
    return np.asarray(x).astype(np.uint16, copy=False)


def zigzag16(x) -> np.ndarray:
    """(x + x) ^ (x >> 15) with arithmetic shift (press/trans.c:75-78)."""
    u = _as_u16(x)
    sign = (0 - (u >> 15)).astype(np.uint16)  # 0x0000 or 0xFFFF
    return ((u + u) ^ sign).astype(np.uint16)


def unzigzag16(z) -> np.ndarray:
    """(z >> 1) ^ -(z & 1) (press/trans.c:80-83); returns uint16 bits."""
    z = _as_u16(z)
    return ((z >> 1) ^ (0 - (z & 1)).astype(np.uint16)).astype(np.uint16)


def delta_u16(x) -> np.ndarray:
    """d[i] = x[i] - x[i-1] (x[-1]=0) in wrapping uint16 space."""
    u = _as_u16(x)
    prev = np.concatenate([np.zeros(1, np.uint16), u[:-1]])
    return (u - prev).astype(np.uint16)


def undelta_u16(d) -> np.ndarray:
    """Inverse of delta_u16: wrapping prefix sum."""
    return np.cumsum(_as_u16(d), dtype=np.uint16)


def zigdelta(x) -> np.ndarray:
    """Zigzag of successive deltas, nin elements, prev=0
    (press/trans.c:215-230 zigdelta_16_u16)."""
    return zigzag16(delta_u16(x))


def unzigdelta(z) -> np.ndarray:
    """Inverse of zigdelta; returns int16 signal
    (press/trans.c:260-270 unzigdelta_u16_16)."""
    return undelta_u16(unzigzag16(z)).astype(np.int16)


def delta_increasing_u32(pos) -> np.ndarray:
    """out[0]=pos[0]; out[i]=pos[i]-pos[i-1]-1 for strictly increasing
    uint32 index lists (press/trans.c:129-149)."""
    p = np.asarray(pos, dtype=np.uint32)
    if p.size == 0:
        return p
    out = np.empty_like(p)
    out[0] = p[0]
    out[1:] = p[1:] - p[:-1] - 1
    return out


def undelta_increasing_u32(d) -> np.ndarray:
    """Inverse of delta_increasing_u32 (press/trans.c:186-197)."""
    d = np.asarray(d, dtype=np.uint32)
    if d.size == 0:
        return d
    adj = d.astype(np.uint64) + 1
    adj[0] = d[0]
    return np.cumsum(adj).astype(np.uint32)


def find_qts(x, max_q: int = 5) -> int:
    """Largest q <= max_q such that every sample has q trailing zero bits
    (press/ex_zd.c:358-381)."""
    u = _as_u16(x)
    if u.size == 0:
        return max_q
    orall = np.bitwise_or.reduce(u)
    for q in range(max_q, 0, -1):
        if (int(orall) & ((1 << q) - 1)) == 0:
            return q
    return 0


def qts_shift(x, q: int) -> np.ndarray:
    """Arithmetic right shift by q (press/ex_zd.c:383-394)."""
    return (np.asarray(x, dtype=np.int16) >> q).astype(np.int16)


def qts_unshift(x, q: int) -> np.ndarray:
    """Left shift by q in int16 wrap space (press/ex_zd.c:396-401)."""
    return (_as_u16(x) << q).astype(np.int16)


# --------------------------------------------------------------------------
# JAX batched versions.  Shapes are static; arithmetic in int32 with masking
# so XLA never silently promotes (uint16 on TPU is emulated via int32 lanes).
# --------------------------------------------------------------------------


def jnp_zigdelta(x):
    """Batched zigzag-delta over the last axis; int16 in, uint16-valued
    int32 out."""
    import jax.numpy as jnp

    u = jnp.asarray(x).astype(jnp.int32) & 0xFFFF
    prev = jnp.pad(u[..., :-1], [(0, 0)] * (u.ndim - 1) + [(1, 0)])
    d = (u - prev) & 0xFFFF
    sign = (0x10000 - (d >> 15)) & 0xFFFF  # 0 or 0xFFFF
    return ((d + d) & 0xFFFF) ^ sign


def jnp_unzigdelta(z):
    """Batched inverse: uint16-valued int32 in, int16 out."""
    import jax.numpy as jnp

    z = jnp.asarray(z).astype(jnp.int32) & 0xFFFF
    d = (z >> 1) ^ (0x10000 - (z & 1)) & 0xFFFF
    d = d & 0xFFFF
    s = jnp.cumsum(d, axis=-1) & 0xFFFF
    return (s - ((s & 0x8000) << 1)).astype(jnp.int16)
