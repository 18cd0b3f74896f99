"""Data-parallel sharding over the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from honours_tpu.engine.pipeline import canned_rans_tables, press_srans_batch
from honours_tpu.io.batching import bucket_reads, restore_order
from honours_tpu.shard.mesh import (
    make_mesh,
    pad_rows_to_devices,
    shard_batch,
    sharded_encode,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_encode_matches_single_device():
    rng = np.random.default_rng(5)
    B, L = 16, 512
    sig = rng.integers(300, 900, (B, L)).astype(np.int16)
    n = np.full((B,), L, np.int32)
    n[3] = 100
    freqs, cum = canned_rans_tables()

    stream1, len1 = press_srans_batch(jnp.asarray(sig), jnp.asarray(n), freqs, cum)
    mesh = make_mesh()
    stream2, len2, comp, raw = sharded_encode(
        mesh, lambda s, nn, f, c: press_srans_batch(s, nn, f, c), sig, n, freqs, cum
    )
    assert np.array_equal(np.asarray(stream1), np.asarray(stream2))
    assert np.array_equal(np.asarray(len1), np.asarray(len2))
    assert comp == int(np.asarray(len1).sum())
    assert raw == int(n.sum()) * 2


def test_pad_rows_to_devices():
    sig = np.zeros((5, 16), np.int16)
    n = np.ones(5, np.int32)
    sig2, n2 = pad_rows_to_devices(sig, n, 8)
    assert sig2.shape == (8, 16) and n2[5:].sum() == 0


def test_bucket_and_restore_order():
    rng = np.random.default_rng(6)
    sigs = [
        rng.integers(-100, 100, sz).astype(np.int16)
        for sz in [5, 3000, 1200, 7, 70000, 1025]
    ]
    buckets = bucket_reads(sigs, min_l=1024)
    assert sum(b.indices.size for b in buckets) == len(sigs)
    for b in buckets:
        assert b.sig.shape[1] == b.L and b.L % 8 == 0 or b.L >= 1024
        for row, i in enumerate(b.indices):
            assert np.array_equal(b.sig[row, : b.n[row]], sigs[i])
    outputs = [[int(x) for x in b.indices] for b in buckets]
    flat = restore_order(buckets, outputs)
    assert flat == list(range(len(sigs)))


def test_metrics_psum_collective():
    """The byte totals come from a psum over the mesh (exercises the
    collective path the multi-host run uses)."""
    rng = np.random.default_rng(7)
    B, L = 8, 256
    sig = rng.integers(0, 500, (B, L)).astype(np.int16)
    n = np.full((B,), L, np.int32)
    freqs, cum = canned_rans_tables()
    mesh = make_mesh()
    _, out_len, comp, raw = sharded_encode(
        mesh, lambda s, nn, f, c: press_srans_batch(s, nn, f, c), sig, n, freqs, cum
    )
    assert comp == int(np.asarray(out_len).sum())
    assert raw == B * L * 2
