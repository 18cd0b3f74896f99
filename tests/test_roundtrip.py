"""Property tests: depress(press(x)) == x for every registered codec on
random/adversarial int16 arrays (SURVEY §4 test plan)."""

import numpy as np
import pytest

from conftest import rng_signals

from honours_tpu.codecs import base as registry


def all_codecs():
    return registry.names()


@pytest.mark.parametrize("name", all_codecs())
def test_roundtrip_adversarial(name):
    codec = registry.get(name)
    for i, sig in enumerate(rng_signals()):
        if name == "uint11" and sig.size and sig.view(np.uint16).max() >= 2**11:
            continue  # fixed 11-bit pack is only lossless for 11-bit data
        out = codec.depress(codec.press(sig), sig.size)
        assert out.dtype == np.int16
        assert np.array_equal(out, sig), f"{name} case {i} (n={sig.size})"


@pytest.mark.parametrize("name", all_codecs())
def test_roundtrip_fixture(name, fixture_reads):
    codec = registry.get(name)
    for sig in fixture_reads:
        out = codec.depress(codec.press(sig), sig.size)
        assert np.array_equal(out, sig), name


def test_flac_size_parity_gate(fixture_reads):
    """FLAC capability row (COVERAGE.md §2.1): our from-scratch fixed-
    predictor + Rice codec is a declared permanent deviation from the
    libFLAC container; this gate pins its size parity — fixture ratio
    must stay >= 2.884 against libFLAC's 2.893 at the reference's P11
    settings (press/press.c:2188-2528, press/test.h:97-98)."""
    codec = registry.get("flac")
    raw = sum(s.size * 2 for s in fixture_reads)
    comp = sum(len(codec.press(s)) for s in fixture_reads)
    assert raw / comp >= 2.884, raw / comp
