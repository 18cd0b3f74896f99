"""Batched TPU stall segmenter vs the serial C oracle (native/segment.c,
itself boundary-exact with the reference's jnn segmenter)."""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu import native
from honours_tpu.segment import find_stall_batch


def _batch(signals):
    L = max(s.size for s in signals)
    L = -(-L // 8) * 8
    B = len(signals)
    sig = np.zeros((B, L), np.int16)
    n = np.zeros(B, np.int32)
    for i, s in enumerate(signals):
        sig[i, : s.size] = s
        n[i] = s.size
    return jnp.asarray(sig), jnp.asarray(n)


def _check(signals):
    sig, n = _batch(signals)
    ex, st, ln = (np.asarray(x) for x in find_stall_batch(sig, n))
    for i, s in enumerate(signals):
        c_ex, c_st, c_ln = native.find_stall(np.asarray(s, np.int16))
        assert bool(ex[i]) == bool(c_ex), (i, bool(ex[i]), c_ex)
        if c_ex:
            assert (int(st[i]), int(ln[i])) == (c_st, c_ln), (
                i, int(st[i]), int(ln[i]), c_st, c_ln
            )


def test_fixture_boundaries_match_c(fixture_reads):
    _check(list(fixture_reads))


def test_synthetic_stalls_match_c():
    rng = np.random.default_rng(8)
    base = rng.integers(420, 470, 4000).astype(np.int16)  # tight band
    noisy = rng.integers(0, 1200, 4000).astype(np.int16)
    sigs = [
        base,
        noisy,
        np.concatenate([noisy[:500], base[:800], noisy[500:1500]]).astype(np.int16),
        np.concatenate([base[:200], noisy[:100], base[200:500]]).astype(np.int16),
        rng.integers(-500, 1500, 3000).astype(np.int16),  # clamping active
        np.full(2000, 450, np.int16),  # zero variance
        rng.integers(440, 460, 30).astype(np.int16),  # shorter than window
    ]
    _check(sigs)


def test_random_reads_match_c():
    rng = np.random.default_rng(9)
    sigs = []
    for _ in range(12):
        parts = []
        for _ in range(rng.integers(1, 5)):
            kind = rng.integers(0, 3)
            m = int(rng.integers(50, 1200))
            if kind == 0:
                c = int(rng.integers(300, 700))
                parts.append(rng.integers(c - 20, c + 20, m))
            elif kind == 1:
                parts.append(rng.integers(0, 1200, m))
            else:
                parts.append(rng.integers(200, 900, m))
        sigs.append(np.concatenate(parts).astype(np.int16))
    _check(sigs)
