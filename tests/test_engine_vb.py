"""Batched vb-container + classic svb engines vs the serial host codecs
(byte-identical streams, lossless decode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu.codecs import base as registry
from honours_tpu.engine.svb32 import svb32_decode_batch, svb32_encode_batch
from honours_tpu.engine.vb_batch import (
    depress_svb_zd_batch,
    depress_vb_zd_batch,
    press_svb_zd_batch,
    press_vb_zd_batch,
)
from honours_tpu.kernels.svb import svb0124_encode, svb32_encode

L = 1024


@pytest.fixture(scope="module")
def batch(fixture_reads):
    rng = np.random.default_rng(13)
    sigs = [
        fixture_reads[0][:L],
        fixture_reads[1][500 : 500 + L // 2],
        np.array([256, 5, -3, 700, 0, 0, 0, 1], np.int16),
        np.zeros(5, np.int16),
        rng.integers(-600, 600, 321).astype(np.int16),
        np.tile(np.array([0, 30000], np.int16), 200),  # many exceptions
        np.array([5], np.int16),  # nex == 0 single sample
        np.array([5, 700], np.int16),  # nex == 1 framing
    ]
    B = len(sigs)
    sig = np.zeros((B, L), np.int16)
    n = np.zeros(B, np.int32)
    for i, s in enumerate(sigs):
        sig[i, : s.size] = s
        n[i] = s.size
    return sigs, jnp.asarray(sig), jnp.asarray(n)


def test_svb32_engine_matches_serial(batch):
    rng = np.random.default_rng(2)
    vals = [
        rng.integers(0, 1 << 8, 64).astype(np.uint32),
        rng.integers(0, 1 << 16, 100).astype(np.uint32),
        rng.integers(0, 1 << 32, 128, dtype=np.uint64).astype(np.uint32),
        np.zeros(5, np.uint32),
        np.array([0], np.uint32),
    ]
    N = 128
    B = len(vals)
    buf = np.zeros((B, N), np.uint32)
    nn = np.zeros(B, np.int32)
    for i, v in enumerate(vals):
        buf[i, : v.size] = v
        nn[i] = v.size
    for variant, ser in (("1234", svb32_encode), ("0124", svb0124_encode)):
        st, sl = svb32_encode_batch(jnp.asarray(buf), jnp.asarray(nn), variant)
        st, sl = np.asarray(st), np.asarray(sl)
        for i, v in enumerate(vals):
            assert st[i, : sl[i]].tobytes() == ser(v), (variant, i)
        dec = np.asarray(
            svb32_decode_batch(jnp.asarray(st), jnp.asarray(nn), N, variant)
        ).astype(np.uint32)
        for i, v in enumerate(vals):
            assert np.array_equal(dec[i, : v.size], v), (variant, i)


@pytest.mark.parametrize("kind", ["vb1e2", "vbe21", "vbsbe21", "vbsse21"])
def test_vb_zd_engine_encode_exact(batch, kind):
    sigs, sig, n = batch
    stream, slen = press_vb_zd_batch(sig, n, kind)
    stream, slen = np.asarray(stream), np.asarray(slen)
    c = registry.get(f"{kind}_zd")
    for i, s in enumerate(sigs):
        assert stream[i, : slen[i]].tobytes() == c.press(s), (kind, i)


@pytest.mark.parametrize("kind", ["vb1e2", "vbe21", "vbsbe21", "vbsse21"])
def test_vb_zd_engine_decode_lossless(batch, kind):
    sigs, sig, n = batch
    stream, _ = press_vb_zd_batch(sig, n, kind)
    out = np.asarray(depress_vb_zd_batch(stream, n, kind, L))
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), (kind, i)


@pytest.mark.parametrize("kind", ["vbe21", "vbsse21"])
def test_vb_zd_engine_decodes_host_streams(batch, kind):
    sigs, sig, n = batch
    c = registry.get(f"{kind}_zd")
    blobs = [c.press(s) for s in sigs]
    W = max(len(b) for b in blobs)
    buf = np.zeros((len(sigs), W), np.uint8)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(depress_vb_zd_batch(jnp.asarray(buf), n, kind, L))
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), (kind, i)


@pytest.mark.parametrize("variant,name", [("1234", "svb_zd"), ("0124", "svb0124_zd")])
def test_svb_zd_engine(batch, variant, name):
    sigs, sig, n = batch
    stream, slen = press_svb_zd_batch(sig, n, variant)
    stream, slen = np.asarray(stream), np.asarray(slen)
    c = registry.get(name)
    for i, s in enumerate(sigs):
        assert stream[i, : slen[i]].tobytes() == c.press(s), i
    out = np.asarray(
        depress_svb_zd_batch(jnp.asarray(stream), n, L, variant)
    )
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), i
