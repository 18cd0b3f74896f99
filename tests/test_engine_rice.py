"""Batched rice encode vs the host codec (byte-exact incl. framing)."""

import numpy as np
import pytest

from honours_tpu.codecs.base import get as get_codec
from honours_tpu.engine.pipeline import pad_batch
from honours_tpu.engine.rice import press_rice_vb_zd_batch, rice_encode_batch
from honours_tpu.codecs.rice import rice_encode

from conftest import rng_signals


def test_rice_blob_byte_exact():
    rng = np.random.default_rng(9)
    datas = [
        rng.integers(0, 256, 500).astype(np.uint8),
        rng.integers(0, 8, 700).astype(np.uint8),     # small values, k=0/1
        np.full(300, 255, np.uint8),                  # k=7
        np.zeros(100, np.uint8),
        rng.integers(0, 256, 1).astype(np.uint8),
        np.zeros(0, np.uint8),
        rng.geometric(0.05, 900).clip(0, 255).astype(np.uint8),
    ]
    N = max(d.size for d in datas)
    N = -(-N // 8) * 8
    B = len(datas)
    buf = np.zeros((B, N), np.int32)
    dl = np.zeros(B, np.int32)
    for i, d in enumerate(datas):
        buf[i, : d.size] = d
        dl[i] = d.size
    import jax.numpy as jnp

    blob, blen = rice_encode_batch(jnp.asarray(buf), jnp.asarray(dl))
    blob, blen = np.asarray(blob), np.asarray(blen)
    for i, d in enumerate(datas):
        want = rice_encode(d)
        assert blob[i, : blen[i]].tobytes() == want, i


@pytest.mark.parametrize("kind", ["vbe21", "vbbe21", "vbsbe21", "vbsse21"])
def test_rice_vb_zd_engine_byte_parity(kind):
    host = get_codec(f"rice_{kind}_zd")
    cases = rng_signals(seed=17)
    sig, n = pad_batch(cases)
    st, sl = press_rice_vb_zd_batch(sig, n, kind)
    for i, c in enumerate(cases):
        got = np.asarray(st[i, : int(sl[i])]).tobytes()
        assert got == host.press(c), f"{kind} case {i}"


def test_rice_runner_roundtrip_with_host_decode(capsys):
    from honours_tpu.engine import runner

    cases = rng_signals(seed=23)[:6]
    streams = runner.press_signals_tpu(cases, "rice_vbbe21_zd")
    host = get_codec("rice_vbbe21_zd")
    for c, s in zip(cases, streams):
        assert s == host.press(c)
    back = runner.depress_signals_tpu(
        streams, [c.size for c in cases], "rice_vbbe21_zd"
    )
    for c, d in zip(cases, back):
        assert np.array_equal(c, d)
