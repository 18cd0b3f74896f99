"""Fused svb16 Mosaic kernels (interpret mode) vs the host kernels.

Byte parity target: honours_tpu.kernels.svb.svb16_encode (and hence the
reference C, press/svb16/encode_scalar.c) — same oracle the XLA engine
(engine/svb16.py) is tested against in test_engine_vb.py.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from honours_tpu.engine.svb16_fused import svb16_encode_fused, svb16_decode_fused
from honours_tpu.kernels.svb import svb16_encode
from honours_tpu.transforms.core import zigdelta


def _batch(seed, B, L):
    rng = np.random.default_rng(seed)
    sig = np.zeros((B, L), np.int16)
    n = np.zeros(B, np.int32)
    for i in range(B):
        kind = i % 4
        ni = int(rng.integers(0, L + 1)) if kind == 0 else L
        if kind == 1:
            row = rng.integers(400, 700, ni)  # nanopore-like, few 2-byte
        elif kind == 2:
            row = rng.integers(-(2 ** 15), 2 ** 15, ni)  # all exceptions
        else:
            row = rng.integers(0, 2, ni) * 3000
        sig[i, :ni] = row.astype(np.int16)
        n[i] = ni
    n[0] = 0
    n[1] = 1
    return sig, n


@pytest.mark.parametrize("zd", [True, False])
def test_encode_fused_matches_host(zd):
    B, L = 8, 256
    sig, n = _batch(0, B, L)
    stream, olen = svb16_encode_fused(
        jnp.asarray(sig), jnp.asarray(n), zd=zd, interpret=True
    )
    stream, olen = np.asarray(stream), np.asarray(olen)
    for i in range(B):
        row = sig[i, : n[i]]
        v = zigdelta(row) if zd else row.astype(np.int64) % (1 << 16)
        ref = svb16_encode(v.astype(np.uint16))
        assert olen[i] == len(ref), i
        assert stream[i, : olen[i]].tobytes() == ref, i


@pytest.mark.parametrize("zd", [True, False])
def test_decode_fused_roundtrip(zd):
    B, L = 8, 256
    sig, n = _batch(1, B, L)
    stream, olen = svb16_encode_fused(
        jnp.asarray(sig), jnp.asarray(n), zd=zd, interpret=True
    )
    dec = np.asarray(
        svb16_decode_fused(stream, jnp.asarray(n), L, zd=zd, interpret=True)
    )
    want = sig.copy()
    for i in range(B):
        want[i, n[i]:] = 0
    np.testing.assert_array_equal(dec, want)


def test_fused_matches_xla_engine():
    from honours_tpu.engine.svb16 import svb16_encode_batch

    B, L = 8, 512
    sig, n = _batch(2, B, L)
    s1, l1 = svb16_encode_fused(
        jnp.asarray(sig), jnp.asarray(n), zd=True, interpret=True
    )
    s2, l2 = svb16_encode_batch(jnp.asarray(sig), jnp.asarray(n), zd=True)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    s1, s2 = np.asarray(s1), np.asarray(s2)
    for i in range(B):
        assert s1[i, : l1[i]].tobytes() == s2[i, : l1[i]].tobytes(), i
