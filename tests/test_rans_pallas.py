"""Pallas rANS decode kernel logic (interpret mode) vs the host codec.

Order-0 (wire format v2) rides the unified gather-route decode kernel in
engine/rans_o1_pallas.py with degenerate single-cluster tables.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from honours_tpu.codecs.srans import canned_freqs
from honours_tpu.engine.rans_o1_pallas import R, rans_decode_shared_pallas
from honours_tpu.kernels.rans import K_SHARED, rans_encode_shared


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_decode_matches_host(seed):
    rng = np.random.default_rng(seed)
    freqs = canned_freqs()
    probs = freqs / freqs.sum()
    cume = np.concatenate([[0], np.cumsum(freqs)]).astype(np.int32)
    N = 1000
    lens = [1000, 999, 0, 1, 32, 640, 1000, 128][: R]
    datas = [rng.choice(256, size=n, p=probs).astype(np.uint8) for n in lens]
    streams = [rans_encode_shared(d, freqs) for d in datas]
    Mb = max(len(s) for s in streams)
    body = np.zeros((R, Mb), np.uint8)
    states = np.zeros((R, K_SHARED), np.int32)
    for i, s in enumerate(streams):
        states[i] = (
            np.frombuffer(s, "<u4", count=K_SHARED)
            .astype(np.int64)
            .astype(np.int32)
        )
        b = np.frombuffer(s, np.uint8)[4 * K_SHARED :]
        body[i, : b.size] = b
    out = np.asarray(
        rans_decode_shared_pallas(
            jnp.asarray(body),
            jnp.asarray(states),
            jnp.asarray(np.array(lens, np.int32)),
            jnp.asarray(cume),
            N,
            K_SHARED,
            interpret=True,
        )
    )
    for i, d in enumerate(datas):
        np.testing.assert_array_equal(out[i, : d.size], d)
