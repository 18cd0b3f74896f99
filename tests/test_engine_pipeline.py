"""Batched flagship pipelines vs serial codecs (small shapes; CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu.codecs import base as registry
from honours_tpu.engine.pipeline import (
    canned_huffman_tables,
    canned_rans_tables,
    depress_srans_batch,
    pad_batch,
    press_shuff_batch,
    press_srans_batch,
)

L = 1024


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
    ]
    sig, n = pad_batch(sigs, L)
    return sigs, sig, n


def test_srans_encode_exact(batch):
    sigs, sig, n = batch
    freqs, cum = canned_rans_tables()
    stream, slen = press_srans_batch(sig, n, freqs, cum)
    stream, slen = np.asarray(stream), np.asarray(slen)
    c = registry.get("srans_vbbe21_zd")
    for i, s in enumerate(sigs):
        assert stream[i, : slen[i]].tobytes() == c.press(s), i


def test_srans_decode_lossless(batch):
    sigs, sig, n = batch
    freqs, cum = canned_rans_tables()
    stream, _ = press_srans_batch(sig, n, freqs, cum)
    out = np.asarray(depress_srans_batch(stream, n, freqs, cum, L))
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), i


def test_srans_cross_decode(batch):
    """Serial host codec decodes the batched streams and vice versa."""
    sigs, sig, n = batch
    freqs, cum = canned_rans_tables()
    c = registry.get("srans_vbbe21_zd")
    # host encode -> batched decode
    streams = [c.press(s) for s in sigs]
    Mb = max(len(x) for x in streams) + 8
    buf = np.zeros((len(sigs), Mb), np.uint8)
    for i, x in enumerate(streams):
        buf[i, : len(x)] = np.frombuffer(x, np.uint8)
    out = np.asarray(
        depress_srans_batch(jnp.asarray(buf), n, freqs, cum, L)
    )
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), i


def test_shuff_encode_exact(batch):
    sigs, sig, n = batch
    lengths, codes = canned_huffman_tables()
    stream, slen = press_shuff_batch(sig, n, lengths, codes)
    stream, slen = np.asarray(stream), np.asarray(slen)
    c = registry.get("shuffman_vbbe21_zd")
    for i, s in enumerate(sigs):
        assert stream[i, : slen[i]].tobytes() == c.press(s), i
