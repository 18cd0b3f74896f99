"""srans2 (order-1 canned-CDF rANS) — host codec + table tests.

The batched engine byte-equality tests live in test_engine_pipeline.py.
"""

import numpy as np
import pytest

from honours_tpu.codecs.base import get
from honours_tpu.kernels.rans import (
    CTX0,
    M,
    rans_decode_o1,
    rans_encode_o1,
)
from honours_tpu.tables.o1 import (
    build_o1_freqs,
    canned_o1_freqs,
    fixture_streams,
)


def test_canned_table_regenerates_byte_exact():
    tab = build_o1_freqs(fixture_streams())
    assert (tab == canned_o1_freqs()).all()


def test_canned_table_invariants():
    tab = canned_o1_freqs()
    assert tab.shape == (257, 256)
    assert (tab >= 1).all()
    assert (tab.sum(axis=1) == M).all()


@pytest.mark.parametrize(
    "data",
    [
        np.zeros(0, np.uint8),
        np.zeros(1, np.uint8),
        np.arange(256, dtype=np.uint8),
        np.full(1000, 255, np.uint8),
        np.random.default_rng(7).integers(0, 256, 4097).astype(np.uint8),
    ],
)
def test_o1_rans_roundtrip(data):
    tab = canned_o1_freqs()
    stream = rans_encode_o1(data, tab)
    out = rans_decode_o1(stream, data.size, tab)
    assert np.array_equal(out, data)


def test_o1_rans_explicit_s_param():
    """Host S override (engine uses S = L // K) round-trips too."""
    tab = canned_o1_freqs()
    data = np.random.default_rng(3).integers(0, 256, 1000).astype(np.uint8)
    stream = rans_encode_o1(data, tab, S=64)
    assert int(np.frombuffer(stream, "<u4", 1)[0]) == 64
    assert np.array_equal(rans_decode_o1(stream, data.size, tab), data)


def test_codec_roundtrip_fixture_and_adversarial():
    c = get("srans2_vbbe21_zd")
    rng = np.random.default_rng(0)
    sigs = [
        np.zeros(100, np.int16),
        np.array([5], np.int16),
        np.array([-32768, 32767] * 50, np.int16),
        rng.integers(-32768, 32768, 3000).astype(np.int16),
        np.arange(513, dtype=np.int16),
    ]
    for sig in sigs:
        assert c.roundtrip_ok(sig)


def test_codec_beats_reference_best_ratio_on_fixture(fixture_reads):
    """In-sample ratio > dstall-fz's 2.9917 (BASELINE.md best overall).

    In-sample like the reference's own canned shuff table (trained and
    benched on NA12878); the held-out cross-read transfer measured
    during design was 2.976 (tables/o1.py docstring).
    """
    c = get("srans2_vbbe21_zd")
    tot_in = tot_out = 0
    for sig in fixture_reads:
        out = c.press(sig)
        assert np.array_equal(c.depress(out, sig.size), sig)
        tot_in += sig.size * 2
        tot_out += len(out)
    assert tot_in / tot_out > 2.9917


def test_ctx0_is_marginal_row():
    assert CTX0 == 256
