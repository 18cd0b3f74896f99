"""pack_fields_msb / unpack_fields_msb match the scatter/gather versions."""
import numpy as np
import pytest

import jax.numpy as jnp

from honours_tpu.engine.bits import (
    gather_bits_msb,
    pack_fields_msb,
    scatter_bits_msb,
    unpack_fields_msb,
)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("mb", [1, 3, 7, 8, 11, 13, 16, 17, 24])
def test_pack_fields_matches_scatter(seed, mb):
    rng = np.random.default_rng(seed + mb)
    B, N = 3, 200
    vals = rng.integers(0, 1 << mb, (B, N)).astype(np.uint32)
    count = rng.integers(0, N + 1, (B,)).astype(np.int32)
    pos = np.arange(N, dtype=np.int32)[None, :]
    valid = pos < count[:, None]
    offs = pos * mb
    n_words = (N * mb + 31) // 32 + 1
    a = scatter_bits_msb(
        jnp.asarray(vals), mb, jnp.asarray(np.broadcast_to(offs, (B, N))),
        jnp.asarray(valid), n_words,
    )
    b = pack_fields_msb(
        jnp.asarray(vals), mb, jnp.asarray(np.broadcast_to(offs, (B, N))),
        jnp.asarray(valid), n_words,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("mb", [1, 3, 7, 8, 11, 13, 16, 17, 24])
def test_unpack_fields_matches_gather(seed, mb):
    rng = np.random.default_rng(100 + seed + mb)
    B, N = 3, 150
    base = rng.integers(0, 9, (B,)).astype(np.int32)
    M = (N * mb + 7) // 8 + 16
    stream = rng.integers(0, 256, (B, M)).astype(np.uint8)
    count = rng.integers(0, N + 1, (B,)).astype(np.int32)
    got = unpack_fields_msb(
        jnp.asarray(stream), jnp.asarray(base),
        jnp.full((B,), mb, np.int32), jnp.asarray(count), N,
    )
    pos = np.arange(N, dtype=np.int32)[None, :]
    bit_off = (base[:, None] * 8 + pos * mb).astype(np.int32)
    ref = gather_bits_msb(
        jnp.asarray(stream), jnp.asarray(bit_off), jnp.full((B, N), mb)
    )
    ref = np.where(pos < count[:, None], np.asarray(ref), 0)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_unpack_zero_minbits():
    B, N = 2, 16
    stream = jnp.zeros((B, 40), jnp.uint8)
    out = unpack_fields_msb(
        stream, jnp.zeros((B,), jnp.int32), jnp.zeros((B,), jnp.int32),
        jnp.full((B,), N, jnp.int32), N,
    )
    assert np.all(np.asarray(out) == 0)


@pytest.mark.parametrize("seed", [0, 1])
def test_pack_fields_lsb_matches_scatter(seed):
    from honours_tpu.engine.bits import pack_fields_lsb, scatter_bits_lsb

    rng = np.random.default_rng(40 + seed)
    B, N = 3, 300
    lens = rng.integers(1, 23, (B, N)).astype(np.int32)
    vals = (rng.integers(0, 1 << 22, (B, N)) & ((1 << lens) - 1)).astype(
        np.uint32
    )
    count = rng.integers(0, N + 1, (B,)).astype(np.int32)
    valid = np.arange(N)[None, :] < count[:, None]
    offs = np.cumsum(np.where(valid, lens, 0), axis=1) - np.where(valid, lens, 0)
    n_words = (N * 22 + 31) // 32 + 1
    a = scatter_bits_lsb(
        jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
        jnp.asarray(valid), n_words,
    )
    b = pack_fields_lsb(
        jnp.asarray(vals), jnp.asarray(lens), jnp.asarray(offs),
        jnp.asarray(valid), n_words,
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
