"""Batched svb16 engine vs serial host kernels: byte-identical streams.

CPU note: XLA's CPU scatter is slow at large L, so tests use small padded
blocks; full-size throughput runs live in bench.py on the TPU chip.
"""

import numpy as np
import jax.numpy as jnp

from honours_tpu.engine.svb16 import svb16_decode_batch, svb16_encode_batch
from honours_tpu.kernels.svb import svb16_encode
from honours_tpu.transforms.core import zigdelta

L = 4096


def _batch(signals):
    B = len(signals)
    sig = np.zeros((B, L), dtype=np.int16)
    n = np.array([s.size for s in signals], dtype=np.int32)
    for i, s in enumerate(signals):
        sig[i, : s.size] = s
    return jnp.asarray(sig), jnp.asarray(n)


def _cases(fixture_reads):
    rng = np.random.default_rng(7)
    return [
        fixture_reads[0][:L],
        fixture_reads[1][1000 : 1000 + L],
        fixture_reads[2][: L // 2],
        rng.integers(-32768, 32768, 777).astype(np.int16),
        np.zeros(9, np.int16),
        np.array([256], np.int16),
        np.full(L, -300, np.int16),
    ]


def test_encode_matches_serial(fixture_reads):
    signals = _cases(fixture_reads)
    sig, n = _batch(signals)
    stream, out_len = svb16_encode_batch(sig, n, zd=True)
    stream = np.asarray(stream)
    out_len = np.asarray(out_len)
    for i, s in enumerate(signals):
        ref = svb16_encode(zigdelta(s))
        assert out_len[i] == len(ref), i
        assert stream[i, : out_len[i]].tobytes() == ref, i


def test_decode_roundtrip(fixture_reads):
    signals = _cases(fixture_reads)
    sig, n = _batch(signals)
    stream, out_len = svb16_encode_batch(sig, n, zd=True)
    out = np.asarray(svb16_decode_batch(stream, n, L, zd=True))
    for i, s in enumerate(signals):
        assert np.array_equal(out[i, : s.size], s), i


def test_no_zd_mode(fixture_reads):
    signals = _cases(fixture_reads)
    sig, n = _batch(signals)
    stream, out_len = svb16_encode_batch(sig, n, zd=False)
    stream_np = np.asarray(stream)
    out_len = np.asarray(out_len)
    for i, s in enumerate(signals):
        ref = svb16_encode(s.view(np.uint16))
        assert stream_np[i, : out_len[i]].tobytes() == ref, i
    out = np.asarray(svb16_decode_batch(stream, n, L, zd=False))
    for i, s in enumerate(signals):
        assert np.array_equal(out[i, : s.size], s), i
