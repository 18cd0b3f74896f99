"""srans3 (nibble-factorized order-1 rANS, wire format v4).

Host codec round trips, engine byte-parity, cross-decode, ratio band vs
srans2, and the Pallas decode kernel in interpreter mode.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu.codecs.base import get as get_codec
from honours_tpu.engine.entropy_o1n import (
    canned_o1n_device_tables,
    rans_o1n_decode_batch,
    rans_o1n_encode_batch,
)
from honours_tpu.engine.pipeline import (
    depress_srans3_batch,
    pad_batch,
    press_srans3_batch,
)
from honours_tpu.kernels.rans import K_SHARED, rans_decode_o1n, rans_encode_o1n
from honours_tpu.tables.o1n import canned_nibble_tables

L = 1024


@pytest.fixture(scope="module")
def tabs():
    return canned_o1n_device_tables()


def test_host_codec_roundtrip_and_ratio(fixture_reads):
    c = get_codec("srans3_vbbe21_zd")
    c2 = get_codec("srans2_vbbe21_zd")
    for s in (fixture_reads[1][:16384], fixture_reads[2][:8192]):
        blob = c.press(s)
        assert np.array_equal(c.depress(blob, s.size), s)
        # within 1% of srans2 (measured +0.33% model cost)
        assert len(blob) <= len(c2.press(s)) * 1.01


def test_host_oracle_roundtrip_edges():
    rng = np.random.default_rng(31)
    nib = canned_nibble_tables()
    for n in (0, 1, 31, 32, 33, 500, 512):
        d = rng.integers(0, 256, n).astype(np.uint8)
        s = rans_encode_o1n(d, nib)
        assert np.array_equal(rans_decode_o1n(s, n, nib), d), n


def test_engine_encode_matches_host_ragged(tabs):
    rng = np.random.default_rng(13)
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
    stream, slen = rans_o1n_encode_batch(jnp.asarray(buf), jnp.asarray(dl), tabs)
    stream, slen = np.asarray(stream), np.asarray(slen)
    nib = canned_nibble_tables()
    for i, d in enumerate(datas):
        assert stream[i, : slen[i]].tobytes() == rans_encode_o1n(
            d, nib, K=K_SHARED
        ), i


def test_engine_decode_and_cross_decode(tabs):
    rng = np.random.default_rng(14)
    N = 512
    datas = [
        rng.integers(0, 256, n).astype(np.uint8)
        for n in (512, 500, 31, 1, 0, 64)
    ]
    B = len(datas)
    nib = canned_nibble_tables()
    hosts = [rans_encode_o1n(d, nib, K=K_SHARED) for d in datas]
    hw = max(len(h) for h in hosts)
    hbuf = np.zeros((B, hw), np.uint8)
    dl = np.zeros(B, np.int32)
    for i, (d, h) in enumerate(zip(datas, hosts)):
        hbuf[i, : len(h)] = np.frombuffer(h, np.uint8)
        dl[i] = d.size
    dec = np.asarray(
        rans_o1n_decode_batch(
            jnp.asarray(hbuf), jnp.zeros(B, jnp.int32), jnp.asarray(dl), tabs, N
        )
    )
    for i, d in enumerate(datas):
        assert np.array_equal(dec[i, : d.size], d), i


def test_srans3_pipeline_parity_and_lossless(fixture_reads, tabs):
    rng = np.random.default_rng(15)
    sigs = [
        fixture_reads[0][:L],
        fixture_reads[1][500 : 500 + L // 2],
        np.array([256, 5, -3, 700, 0, 0, 0, 1], np.int16),
        rng.integers(-600, 600, 321).astype(np.int16),
        np.zeros(5, np.int16),
    ]
    sig, n = pad_batch(sigs, L)
    stream, slen = press_srans3_batch(sig, n, tabs)
    stream_np, slen_np = np.asarray(stream), np.asarray(slen)
    c = get_codec("srans3_vbbe21_zd")
    for i, s in enumerate(sigs):
        assert stream_np[i, : slen_np[i]].tobytes() == c.press(s), i
    out = np.asarray(depress_srans3_batch(stream, n, tabs, L))
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), i


def test_n4_decode_kernel_interpret(tabs):
    from honours_tpu.engine.bits import read_u32le
    from honours_tpu.engine.permute import rowwise_shift_left
    from honours_tpu.engine.rans_n4_pallas import rans_n4_decode_pallas
    from honours_tpu.engine.entropy_o1 import _ungrid

    rng = np.random.default_rng(16)
    N = 256
    K = K_SHARED
    Smax = -(-N // K)
    nib = canned_nibble_tables()
    lens = [256, 250, 31, 1, 0, 129, 64, 200]
    datas = [rng.integers(0, 256, n).astype(np.uint8) for n in lens]
    hosts = [rans_encode_o1n(d, nib, K=K) for d in datas]
    w = max(len(h) for h in hosts)
    buf = np.zeros((8, w), np.uint8)
    dl = np.zeros(8, np.int32)
    for i, (d, h) in enumerate(zip(datas, hosts)):
        buf[i, : len(h)] = np.frombuffer(h, np.uint8)
        dl[i] = d.size
    stream = jnp.asarray(buf)
    base = jnp.zeros((8,), jnp.int32)
    S_b = read_u32le(stream, base).astype(jnp.int32)
    states = np.stack(
        [np.frombuffer(h, "<u4", K, offset=4).astype(np.int32) for h in hosts]
    )
    body = rowwise_shift_left(stream, base + 4 + 4 * K, w)
    grid = rans_n4_decode_pallas(
        body, jnp.asarray(states), jnp.asarray(dl), S_b, tabs, Smax, K,
        interpret=True,
    )
    out = np.asarray(_ungrid(grid, S_b, jnp.asarray(dl), K, Smax, N))
    for i, d in enumerate(datas):
        assert np.array_equal(out[i, : d.size], d), i


def test_n4_fc_kernel_interpret(tabs):
    from honours_tpu.engine.rans_n4_pallas import o1n_fc_gather_pallas

    rng = np.random.default_rng(17)
    sym = jnp.asarray(rng.integers(0, 256, (2, 300)), jnp.int32)
    ctx = jnp.asarray(rng.integers(0, 257, (2, 300)), jnp.int32)
    fh, fl = o1n_fc_gather_pallas(
        sym, ctx, tabs["cmap_pad"], tabs["lo_assign_pad"],
        tabs["fcH_tab"], tabs["fcL_tab"], interpret=True,
    )
    cl = jnp.take(tabs["flat_cmap"], ctx)
    hi, lo = sym >> 4, sym & 15
    want_h = jnp.take(tabs["flat_fcH"], cl * 16 + hi)
    gl = jnp.take(tabs["flat_lo"], cl * 16 + hi)
    want_l = jnp.take(tabs["flat_fcL"], gl * 16 + lo)
    assert bool(jnp.all(fh == want_h)) and bool(jnp.all(fl == want_l))


def test_srans3_runner_path(fixture_reads):
    from honours_tpu.engine import runner

    sigs = [fixture_reads[0][:4096], fixture_reads[1][:4096]]
    streams = runner.press_signals_tpu(sigs, "srans3_vbbe21_zd")
    host = get_codec("srans3_vbbe21_zd")
    for s, b in zip(sigs, streams):
        assert b == host.press(s)
    back = runner.depress_signals_tpu(
        streams, [s.size for s in sigs], "srans3_vbbe21_zd"
    )
    for s, d in zip(sigs, back):
        assert np.array_equal(s, d)
