"""TPU ex-zd engine: byte-parity with the host codec + lossless runner path.

The engine (engine/exzd.py) must produce streams byte-identical to
codecs.exzd.ExZdCodec (reference framing press/ex_zd.c:403-457) and
decode anything the host codec wrote.
"""

import numpy as np
import pytest

from honours_tpu.codecs.base import get as get_codec
from honours_tpu.engine.exzd import depress_exzd_batch, press_exzd_batch
from honours_tpu.engine.pipeline import pad_batch

from conftest import rng_signals


def _cases():
    rng = np.random.default_rng(7)
    cases = rng_signals(seed=3)
    # qts-active rows: all samples share trailing zero bits
    cases.append((rng.integers(10, 200, 999).astype(np.int16) << 2).astype(np.int16))
    cases.append((rng.integers(-100, 100, 512).astype(np.int16) << 4).astype(np.int16))
    return cases


def test_exzd_engine_byte_parity_random():
    host = get_codec("hasgam_vbsse21_zdq")
    cases = _cases()
    sig, n = pad_batch(cases)
    st, sl = press_exzd_batch(sig, n)
    for i, c in enumerate(cases):
        want = host.press(c)
        got = np.asarray(st[i, : int(sl[i])]).tobytes()
        assert got == want, f"case {i}: engine stream != host stream"


def test_exzd_engine_roundtrip_and_host_interop():
    host = get_codec("hasgam_vbsse21_zdq")
    cases = _cases()
    sig, n = pad_batch(cases)
    L = sig.shape[1]
    st, sl = press_exzd_batch(sig, n)
    dec = np.asarray(depress_exzd_batch(st, n, L))
    for i, c in enumerate(cases):
        assert np.array_equal(dec[i, : c.size], c), f"case {i} round trip"
        # engine decodes host streams too
        hb = host.press(c)
        buf = np.zeros((1, max(len(hb), 128)), np.uint8)
        buf[0, : len(hb)] = np.frombuffer(hb, np.uint8)
        d2 = np.asarray(
            depress_exzd_batch(buf, np.array([c.size], np.int32), L)
        )
        assert np.array_equal(d2[0, : c.size], c), f"case {i} host->engine"


def test_exzd_engine_fixture_parity(fixture_reads):
    host = get_codec("hasgam_vbsse21_zdq")
    reads = [r[:4096] for r in fixture_reads]
    sig, n = pad_batch(reads)
    st, sl = press_exzd_batch(sig, n, emax=sig.shape[1] // 16)
    for i, r in enumerate(reads):
        assert np.asarray(st[i, : int(sl[i])]).tobytes() == host.press(r)


def test_exzd_runner_path():
    from honours_tpu.engine import runner

    cases = _cases()
    streams = runner.press_signals_tpu(cases, "hasgam_vbsse21_zdq")
    host = get_codec("hasgam_vbsse21_zdq")
    for c, s in zip(cases, streams):
        assert s == host.press(c)
    back = runner.depress_signals_tpu(
        streams, [c.size for c in cases], "hasgam_vbsse21_zdq"
    )
    for c, d in zip(cases, back):
        assert np.array_equal(c, d)


def test_exzd_runner_overflow_fallback():
    """A row whose exception count exceeds the engine cap must fall back
    to the host codec transparently (detected from the stream's own nex
    field at byte 12)."""
    from honours_tpu.engine import runner

    rng = np.random.default_rng(11)
    # huge deltas everywhere -> nex ~ n >> emax
    bad = (rng.integers(-30000, 30000, 4096)).astype(np.int16)
    good = rng.integers(450, 550, 4096).astype(np.int16)
    sigs = [good, bad]
    streams = runner.press_signals_tpu(sigs, "hasgam_vbsse21_zdq")
    host = get_codec("hasgam_vbsse21_zdq")
    for c, s in zip(sigs, streams):
        assert s == host.press(c)
    back = runner.depress_signals_tpu(
        streams, [c.size for c in sigs], "hasgam_vbsse21_zdq"
    )
    for c, d in zip(sigs, back):
        assert np.array_equal(c, d)
