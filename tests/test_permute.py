"""Property tests for the log-shift monotone permutation primitives."""
import numpy as np
import pytest

import jax.numpy as jnp

from honours_tpu.engine.permute import (
    monotone_compact,
    monotone_expand,
    rowwise_concat,
    rowwise_shift_right,
)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("N", [1, 7, 64, 257, 1024])
def test_monotone_compact_matches_numpy(seed, N):
    rng = np.random.default_rng(seed)
    B = 5
    vals = rng.integers(0, 250, (B, N)).astype(np.int32)
    keep = rng.random((B, N)) < rng.random((B, 1))  # varied densities
    out, count = monotone_compact(jnp.asarray(vals), jnp.asarray(keep))
    out, count = np.asarray(out), np.asarray(count)
    for b in range(B):
        ref = vals[b][keep[b]]
        assert count[b] == ref.size
        np.testing.assert_array_equal(out[b, : ref.size], ref)
        np.testing.assert_array_equal(out[b, ref.size :], 0)


def test_monotone_compact_edge_masks():
    v = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    out, c = monotone_compact(v, jnp.asarray([[False] * 4]))
    assert int(c[0]) == 0 and np.all(np.asarray(out) == 0)
    out, c = monotone_compact(v, jnp.asarray([[True] * 4]))
    assert int(c[0]) == 4
    np.testing.assert_array_equal(np.asarray(out)[0], [1, 2, 3, 4])


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("N,width", [(8, 16), (100, 256), (512, 1024)])
def test_monotone_expand_matches_numpy(seed, N, width):
    rng = np.random.default_rng(seed)
    B = 4
    vals = rng.integers(1, 250, (B, N)).astype(np.int32)
    # non-decreasing shifts, targets < width
    steps = rng.integers(0, 2, (B, N))
    shift = np.cumsum(steps, axis=1)
    shift = (shift * (width - N - 1) // np.maximum(shift[:, -1:], 1)).astype(
        np.int32
    )
    nvalid = rng.integers(0, N + 1, (B,))
    valid = np.arange(N)[None, :] < nvalid[:, None]
    out, covered = monotone_expand(
        jnp.asarray(vals), jnp.asarray(shift), jnp.asarray(valid), width
    )
    out, covered = np.asarray(out), np.asarray(covered)
    for b in range(B):
        ref = np.zeros(width, np.int32)
        cov = np.zeros(width, bool)
        for j in range(nvalid[b]):
            ref[j + shift[b, j]] = vals[b, j]
            cov[j + shift[b, j]] = True
        np.testing.assert_array_equal(out[b], ref)
        np.testing.assert_array_equal(covered[b], cov)


def test_expand_then_compact_roundtrip():
    rng = np.random.default_rng(3)
    B, N, W = 3, 200, 512
    vals = rng.integers(1, 255, (B, N)).astype(np.int32)
    shift = np.cumsum(rng.integers(0, 2, (B, N)), axis=1).astype(np.int32)
    valid = np.ones((B, N), bool)
    out, covered = monotone_expand(
        jnp.asarray(vals), jnp.asarray(shift), jnp.asarray(valid), W
    )
    back, count = monotone_compact(out, covered)
    np.testing.assert_array_equal(np.asarray(count), [N] * B)
    np.testing.assert_array_equal(np.asarray(back)[:, :N], vals)


@pytest.mark.parametrize("seed", [0, 5])
def test_rowwise_shift_right(seed):
    rng = np.random.default_rng(seed)
    B, M, W = 6, 40, 97
    buf = rng.integers(0, 255, (B, M)).astype(np.uint8)
    shift = rng.integers(0, W - M, (B,)).astype(np.int32)
    out = np.asarray(rowwise_shift_right(jnp.asarray(buf), jnp.asarray(shift), W))
    for b in range(B):
        ref = np.zeros(W, np.uint8)
        ref[shift[b] : shift[b] + M] = buf[b]
        np.testing.assert_array_equal(out[b], ref)


def test_rowwise_concat_matches_reference_impl():
    rng = np.random.default_rng(7)
    B = 4
    segs = []
    for Mi in (3, 17, 64):
        buf = rng.integers(1, 255, (B, Mi)).astype(np.uint8)
        ln = rng.integers(0, Mi + 1, (B,)).astype(np.int32)
        segs.append((buf, ln))
    total = 128
    out, tlen = rowwise_concat(
        [(jnp.asarray(b), jnp.asarray(l)) for b, l in segs], total
    )
    out, tlen = np.asarray(out), np.asarray(tlen)
    for b in range(B):
        ref = np.concatenate([buf[b, : l[b]] for buf, l in segs])
        assert tlen[b] == ref.size
        np.testing.assert_array_equal(out[b, : ref.size], ref)
        np.testing.assert_array_equal(out[b, ref.size :], 0)


def test_compaction_shifts_inverts_compaction():
    from honours_tpu.engine.permute import compaction_shifts

    rng = np.random.default_rng(11)
    B, N = 4, 300
    vals = rng.integers(1, 255, (B, N)).astype(np.int32)
    keep = rng.random((B, N)) < 0.6
    compacted, count = monotone_compact(jnp.asarray(vals), jnp.asarray(keep))
    shifts, count2 = compaction_shifts(jnp.asarray(keep))
    np.testing.assert_array_equal(np.asarray(count), np.asarray(count2))
    valid = np.arange(N)[None, :] < np.asarray(count)[:, None]
    back, covered = monotone_expand(
        compacted, shifts, jnp.asarray(valid), N
    )
    np.testing.assert_array_equal(
        np.asarray(back), np.where(keep, vals, 0)
    )
    np.testing.assert_array_equal(np.asarray(covered), keep)


def test_pallas_walks_match_xla_interpret():
    """VMEM-resident walk kernels (the TPU decode hot path) == XLA walks."""
    import jax.numpy as jnp

    from honours_tpu.engine import permute as P
    from honours_tpu.engine import permute_pallas as PP

    rng = np.random.default_rng(0)
    B, N = 8, 300
    vals = jnp.asarray(rng.integers(0, 256, (B, N)), jnp.uint8)
    keep = jnp.asarray(rng.random((B, N)) < 0.7)
    o1, c1 = P.monotone_compact(vals, keep)
    o2, c2 = PP.compact_walk(vals, keep, interpret=True)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    s1, _ = P.compaction_shifts(keep)
    s2, _ = PP.compaction_shifts_walk(keep, interpret=True)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))
    cnt = np.asarray(c1)
    validc = jnp.asarray(np.arange(N)[None, :] < cnt[:, None])
    e1, a1 = P.monotone_expand(o1.astype(jnp.int32), s1, validc, 512)
    e2, a2 = PP.expand_walk(o1.astype(jnp.int32), s1, validc, 512, interpret=True)
    assert np.array_equal(np.asarray(e1), np.asarray(e2))
    assert np.array_equal(np.asarray(a1), np.asarray(a2))


@pytest.mark.parametrize("dtype", [np.uint8, np.int32])
def test_rowwise_shift_left_walk_route_matches_xla(dtype):
    """The TPU route for rowwise_shift_left is compact_walk with
    keep = cols >= shift; verify the formula (interpret mode) against
    the XLA binary-roll path for u8 and wide payloads, incl. shift > M
    (row fully dropped) and negative wide values."""
    from honours_tpu.engine import permute_pallas as pp
    from honours_tpu.engine.permute import rowwise_shift_left

    rng = np.random.default_rng(3)
    B, M, W = 8, 160, 200
    buf = rng.integers(0, 200, (B, M)).astype(dtype)
    if dtype == np.int32:
        buf[0] -= 150  # negative payloads ride the wide channel
    shift = rng.integers(0, M + 8, (B,)).astype(np.int32)
    shift[1] = M + 5  # past-the-end: whole row drops
    cols = np.arange(M, dtype=np.int32)[None, :]
    out_w, _ = pp.compact_walk(
        jnp.asarray(buf), jnp.asarray(cols >= shift[:, None]), interpret=True
    )
    out_w = np.pad(np.asarray(out_w), ((0, 0), (0, W - M)))[:, :W]
    ref = np.asarray(
        rowwise_shift_left(jnp.asarray(buf), jnp.asarray(shift), W)
    )
    np.testing.assert_array_equal(out_w, ref)


@pytest.mark.parametrize("dtype", [np.uint8, np.int32])
def test_rowwise_shift_right_walk_route_matches_xla(dtype):
    """The TPU route for rowwise_shift_right is expand_walk with a
    constant per-row shift and overflow columns invalidated; verify the
    formula (interpret mode) against the XLA binary-roll path."""
    from honours_tpu.engine import permute_pallas as pp

    rng = np.random.default_rng(4)
    B, M, W = 8, 60, 97
    buf = rng.integers(0, 200, (B, M)).astype(dtype)
    if dtype == np.int32:
        buf[0] -= 150
    shift = rng.integers(0, W + 8, (B,)).astype(np.int32)
    shift[1] = W + 3  # everything shifted out
    padded = np.pad(buf, ((0, 0), (0, W - M)))
    cols = np.arange(W, dtype=np.int32)[None, :]
    valid = cols < (W - shift[:, None])
    sh = np.where(valid, shift[:, None], 0).astype(np.int32)
    out_w, _ = pp.expand_walk(
        jnp.asarray(padded), jnp.asarray(np.broadcast_to(sh, padded.shape)),
        jnp.asarray(valid), W, interpret=True,
    )
    ref = np.asarray(
        rowwise_shift_right(jnp.asarray(buf), jnp.asarray(shift), W)
    )
    np.testing.assert_array_equal(np.asarray(out_w), ref)
