"""Batched srans2 (order-1 rANS) engine vs the serial host codec.

CPU runs exercise the XLA take-route lookup and fallback decode loop;
the Pallas kernels (TPU hot path) are additionally checked here in
interpreter mode on small shapes, and on the real chip by bench.py's
lossless + parity asserts.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu.codecs import base as registry
from honours_tpu.engine.entropy_o1 import (
    _o1_fc_take,
    make_o1_tables,
    rans_o1_decode_batch,
    rans_o1_encode_batch,
)
from honours_tpu.engine.pipeline import (
    canned_o1_device_tables,
    depress_srans2_batch,
    pad_batch,
    press_srans2_batch,
)
from honours_tpu.kernels.rans import K_SHARED, rans_decode_o1, rans_encode_o1
from honours_tpu.tables.o1 import canned_o1_freqs

L = 1024


@pytest.fixture(scope="module")
def tabs():
    return canned_o1_device_tables()


@pytest.fixture(scope="module")
def batch(fixture_reads):
    rng = np.random.default_rng(11)
    sigs = [
        fixture_reads[0][:L],
        fixture_reads[1][500 : 500 + L // 2],
        np.array([256, 5, -3, 700, 0, 0, 0, 1], np.int16),
        np.zeros(5, np.int16),
        rng.integers(-600, 600, 321).astype(np.int16),
        np.tile(np.array([0, 30000], np.int16), 200),  # many exceptions
        np.array([5], np.int16),
        np.zeros(1, np.int16),
    ]
    sig, n = pad_batch(sigs, L)
    return sigs, sig, n


def test_o1_engine_encode_matches_host_ragged(tabs):
    """Engine bytes == host rans_encode_o1 per row, incl. the per-row
    S = ceil(n/K) header (empty, 1-byte, partial-lane rows)."""
    rng = np.random.default_rng(3)
    N = 512
    datas = [
        rng.integers(0, 256, n).astype(np.uint8)
        for n in (512, 500, 31, 33, 1, 0, 256)
    ]
    B = len(datas)
    buf = np.zeros((B, N), np.uint8)
    dl = np.zeros(B, np.int32)
    for i, d in enumerate(datas):
        buf[i, : d.size] = d
        dl[i] = d.size
    stream, slen = rans_o1_encode_batch(jnp.asarray(buf), jnp.asarray(dl), tabs)
    stream, slen = np.asarray(stream), np.asarray(slen)
    tab = canned_o1_freqs()
    for i, d in enumerate(datas):
        assert stream[i, : slen[i]].tobytes() == rans_encode_o1(
            d, tab, K=K_SHARED
        ), i


def test_o1_engine_decode_and_cross_decode(tabs):
    rng = np.random.default_rng(4)
    N = 512
    datas = [
        rng.integers(0, 256, n).astype(np.uint8)
        for n in (512, 500, 31, 1, 0, 64)
    ]
    B = len(datas)
    tab = canned_o1_freqs()
    hosts = [rans_encode_o1(d, tab, K=K_SHARED) for d in datas]
    hw = max(len(h) for h in hosts)
    hbuf = np.zeros((B, hw), np.uint8)
    dl = np.zeros(B, np.int32)
    for i, (d, h) in enumerate(zip(datas, hosts)):
        hbuf[i, : len(h)] = np.frombuffer(h, np.uint8)
        dl[i] = d.size
    dec = np.asarray(
        rans_o1_decode_batch(
            jnp.asarray(hbuf), jnp.zeros(B, jnp.int32), jnp.asarray(dl), tabs, N
        )
    )
    for i, d in enumerate(datas):
        assert np.array_equal(dec[i, : d.size], d), i
    # and host decodes engine streams
    stream, slen = rans_o1_encode_batch(
        jnp.asarray(np.vstack([np.pad(d, (0, N - d.size)) for d in datas]).astype(np.uint8)),
        jnp.asarray(dl),
        tabs,
    )
    stream, slen = np.asarray(stream), np.asarray(slen)
    for i, d in enumerate(datas):
        got = rans_decode_o1(stream[i, : slen[i]].tobytes(), d.size, tab)
        assert np.array_equal(got, d), i


def test_srans2_pipeline_encode_exact(batch, tabs):
    sigs, sig, n = batch
    stream, slen = press_srans2_batch(sig, n, tabs)
    stream, slen = np.asarray(stream), np.asarray(slen)
    c = registry.get("srans2_vbbe21_zd")
    for i, s in enumerate(sigs):
        assert stream[i, : slen[i]].tobytes() == c.press(s), i


def test_srans2_pipeline_decode_lossless(batch, tabs):
    sigs, sig, n = batch
    stream, _ = press_srans2_batch(sig, n, tabs)
    out = np.asarray(depress_srans2_batch(stream, n, tabs, L))
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), i


def test_srans2_pipeline_emax_cap(batch, tabs):
    """The static exception cap shrinks buffers; rows whose exception
    count fits the cap stay byte-exact and lossless."""
    from honours_tpu.transforms.core import zigdelta

    sigs, sig, n = batch
    emax = L // 4
    stream, slen = press_srans2_batch(sig, n, tabs, emax)
    out = np.asarray(depress_srans2_batch(stream, n, tabs, L, emax=emax))
    c = registry.get("srans2_vbbe21_zd")
    stream, slen = np.asarray(stream), np.asarray(slen)
    checked = 0
    for i, s in enumerate(sigs):
        nex = int((zigdelta(np.asarray(s, np.int16))[1:] > 255).sum())
        if nex <= emax:
            assert stream[i, : slen[i]].tobytes() == c.press(s), i
            assert np.array_equal(out[i, : s.size], s), i
            checked += 1
    assert checked >= len(sigs) - 2  # exception-burst rows exceed the cap


def test_srans2_cross_decode_host_streams(batch, tabs):
    """Host codec streams decode on the batched engine."""
    sigs, sig, n = batch
    c = registry.get("srans2_vbbe21_zd")
    streams = [c.press(s) for s in sigs]
    w = max(len(b) for b in streams)
    buf = np.zeros((len(sigs), w), np.uint8)
    for i, b in enumerate(streams):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(depress_srans2_batch(jnp.asarray(buf), n, tabs, L))
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), i


# ---------------------------------------------------------------------------
# Pallas kernels in interpreter mode (semantics without TPU hardware)
# ---------------------------------------------------------------------------


def test_o1_lookup_kernel_interpret(tabs):
    from honours_tpu.engine.rans_o1_pallas import o1_fc_gather_pallas

    rng = np.random.default_rng(5)
    sym = jnp.asarray(rng.integers(0, 256, (2, 300)), jnp.int32)
    ctx = jnp.asarray(rng.integers(0, 257, (2, 300)), jnp.int32)
    fc = o1_fc_gather_pallas(
        sym, ctx, tabs["cmap_pad"], tabs["fc_tab"], interpret=True
    )
    f1, c1 = fc & 8191, fc >> 13
    f2, c2 = _o1_fc_take(sym, ctx, tabs)
    assert bool(jnp.all(f1 == f2)) and bool(jnp.all(c1 == c2))


def test_o1_decode_kernel_interpret(tabs):
    from honours_tpu.engine.bits import read_u32le
    from honours_tpu.engine.permute import rowwise_shift_left
    from honours_tpu.engine.rans_o1_pallas import R, rans_o1_decode_pallas
    from honours_tpu.engine.entropy_o1 import _ungrid

    rng = np.random.default_rng(6)
    N = 256
    K = K_SHARED
    Smax = -(-N // K)
    tab = canned_o1_freqs()
    lens = [256, 250, 31, 1, 0, 129, 64, 200]
    while len(lens) < R:
        lens.append(int(rng.integers(0, N + 1)))
    datas = [rng.integers(0, 256, n).astype(np.uint8) for n in lens]
    assert len(datas) == R
    hosts = [rans_encode_o1(d, tab, K=K) for d in datas]
    w = max(len(h) for h in hosts)
    buf = np.zeros((R, w), np.uint8)
    dl = np.zeros(R, np.int32)
    for i, (d, h) in enumerate(zip(datas, hosts)):
        buf[i, : len(h)] = np.frombuffer(h, np.uint8)
        dl[i] = d.size
    stream = jnp.asarray(buf)
    base = jnp.zeros((R,), jnp.int32)
    S_b = read_u32le(stream, base).astype(jnp.int32)
    states = np.stack(
        [np.frombuffer(h, "<u4", K, offset=4).astype(np.int32) for h in hosts]
    )
    body = rowwise_shift_left(stream, base + 4 + 4 * K, w)
    grid = rans_o1_decode_pallas(
        body, jnp.asarray(states), jnp.asarray(dl), S_b,
        tabs["cmap_pad"], tabs["planes_full"], Smax, K,
        interpret=True,
    )
    out = np.asarray(_ungrid(grid, S_b, jnp.asarray(dl), K, Smax, N))
    for i, d in enumerate(datas):
        assert np.array_equal(out[i, : d.size], d), i

    # body_off route: the UNSHIFTED stream + per-row offsets must decode
    # identically (this is the production TPU path — no alignment walk)
    grid2 = rans_o1_decode_pallas(
        stream, jnp.asarray(states), jnp.asarray(dl), S_b,
        tabs["cmap_pad"], tabs["planes_full"], Smax, K,
        interpret=True, body_off=base + 4 + 4 * K,
    )
    out2 = np.asarray(_ungrid(grid2, S_b, jnp.asarray(dl), K, Smax, N))
    for i, d in enumerate(datas):
        assert np.array_equal(out2[i, : d.size], d), i


def test_encode_core_kernel_interpret(tabs):
    """Pallas encode state walk == the XLA loop (v3 path, interpret)."""
    import jax
    import jax.numpy as jnp

    from honours_tpu.engine.entropy_o1 import _lane_grid, _o1_fc_take
    from honours_tpu.engine.rans_encode_pallas import rans_encode_core_pallas
    from honours_tpu.kernels.rans import rans_encode_o1

    rng = np.random.default_rng(12)
    K = K_SHARED
    N = 256
    datas = [rng.integers(0, 256, n).astype(np.uint8) for n in
             (256, 200, 31, 1, 0, 77, 129, 64)]
    B = len(datas)
    buf = np.zeros((B, N), np.uint8)
    dl = np.zeros(B, np.int32)
    for i, d in enumerate(datas):
        buf[i, : d.size] = d
        dl[i] = d.size
    Smax = -(-N // K)
    g3, ctx3, act3, S_b = _lane_grid(
        jnp.asarray(buf), jnp.asarray(dl), K, Smax
    )
    f, c = _o1_fc_take(g3.reshape(B, -1), ctx3.reshape(B, -1), tabs)
    f3 = f.reshape(B, K, Smax)
    c3 = c.reshape(B, K, Smax)
    fc3 = jnp.where(act3, f3 + c3 * 8192, 0)
    fc = jnp.transpose(fc3, (0, 2, 1)).reshape(B, Smax * K)
    plane, states = rans_encode_core_pallas(fc, Smax, K, interpret=True)
    # assemble the v3 stream from the kernel outputs and compare to host
    from honours_tpu.engine.bits import rowwise_concat, u32le_bytes
    from honours_tpu.engine.entropy_o1 import _u32le_grid
    from honours_tpu.engine.permute import monotone_compact

    body, blen = monotone_compact(
        (plane & 255).astype(jnp.uint8), (plane >> 8) == 1
    )
    segs = [
        (u32le_bytes(S_b), jnp.full((B,), 4, jnp.int32)),
        (_u32le_grid(states), jnp.full((B,), 4 * K, jnp.int32)),
        (body, blen),
    ]
    stream, slen = rowwise_concat(segs, 4 + 4 * K + body.shape[1])
    stream, slen = np.asarray(stream), np.asarray(slen)
    tab = canned_o1_freqs()
    for i, d in enumerate(datas):
        assert stream[i, : slen[i]].tobytes() == rans_encode_o1(
            d, tab, K=K
        ), i
