"""drans_vbbe21_zd (format v5) — self-contained dynamic o1 rANS.

Covers: the fit spec determinism, host codec round trips (single and
batch grouping), engine encode byte-parity with the host batch
implementation, engine decode losslessness, and the no-caveat ratio
property (the stream carries its model; fixture ratio must beat the
reference's best dstall-fz 2.9917, data/reads.blow5.test:36)."""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu.codecs.base import get
from honours_tpu.codecs.drans import drans_depress_reads, drans_press_reads
from honours_tpu.engine.drans import depress_drans_batch, press_drans_batch
from honours_tpu.engine.pipeline import canned_o1_device_tables, pad_batch
from honours_tpu.io.blow5 import read_signals
from honours_tpu.kernels.rans import M
from honours_tpu.tables.drans import NB, bucket_of, dnorm, fit_freqs


def _walk(B, L, seed=5, burst=97):
    rng = np.random.default_rng(seed)
    steps = rng.integers(-40, 41, size=(B, L))
    steps[:, ::burst] = rng.integers(-900, 900, size=(B, (L + burst - 1) // burst))
    return np.cumsum(steps, axis=1).clip(-2000, 2000).astype(np.int16)


def test_bucket_map():
    bm = np.asarray(bucket_of(np.arange(257, dtype=np.int64)))
    assert bm[0] == 0 and bm[47] == 47
    assert bm[48] == 48 and bm[55] == 48 and bm[56] == 49
    assert bm[255] == 56 and bm[256] == 57
    assert bm.min() == 0 and bm.max() == NB - 1
    assert (np.diff(bm) >= 0).all()


def test_dnorm_properties():
    rng = np.random.default_rng(0)
    for _ in range(50):
        e = rng.integers(0, 1000, size=256).astype(np.int64)
        e[rng.random(256) < 0.6] = 0
        if e.sum() == 0:
            e[0] = 1
        f = dnorm(e)
        assert f.sum() == M
        assert (f[e > 0] >= 1).all()
        assert (f[e == 0] == 0).all()
    # determinism
    e = rng.integers(0, 9, size=256).astype(np.int64)
    e[0] = 1
    assert np.array_equal(dnorm(e), dnorm(e.copy()))


def test_fit_freqs_rows_sum_m():
    counts = np.zeros((NB, 256), np.int64)
    counts[0, :10] = 5
    f = fit_freqs(counts)
    assert f.shape == (257, 256)
    assert (f.sum(axis=1) == M).all()
    assert (f >= 1).all()  # base keeps every symbol encodable


def test_codec_roundtrip_fixture():
    c = get("drans_vbbe21_zd")
    for s in read_signals("tests/data/three-reads.blow5"):
        st = c.press(s)
        assert np.array_equal(c.depress(st, s.size), s)


def test_codec_roundtrip_edges():
    c = get("drans_vbbe21_zd")
    cases = [
        np.asarray([5], np.int16),
        np.asarray([5, -7], np.int16),
        np.arange(100, dtype=np.int16),
        np.zeros(1000, np.int16),
        np.asarray([-32768, 32767] * 50, np.int16),
        _walk(1, 3000)[0],
    ]
    for a in cases:
        st = c.press(a)
        assert np.array_equal(c.depress(st, a.size), a), a[:4]


def test_fixture_ratio_beats_reference_best():
    """Self-contained ratio (no canned-table train/test caveat) must top
    the reference's best overall dstall-fz 2.9917."""
    sigs = read_signals("tests/data/three-reads.blow5")
    sts = drans_press_reads(sigs)
    outs = drans_depress_reads(sts, [s.size for s in sigs])
    for s, o in zip(sigs, outs):
        assert np.array_equal(o, s)
    raw = sum(s.size * 2 for s in sigs)
    ratio = raw / sum(len(s) for s in sts)
    assert ratio > 2.9917, ratio


@pytest.mark.parametrize("lens", [[4096] * 8, [4096, 1, 2, 100, 4095, 777, 4000, 8]])
def test_engine_host_parity(lens):
    B, L = 8, 4096
    sig = _walk(B, L)
    sigs = [sig[i, :n] for i, n in enumerate(lens)]
    sigj, nj = pad_batch(sigs, L)
    tabs = canned_o1_device_tables()
    emax = L // 16
    s, l = press_drans_batch(sigj, nj, tabs, emax)
    host = drans_press_reads(sigs)
    for b in range(B):
        assert np.asarray(s[b, : int(l[b])]).tobytes() == host[b], b
    d = depress_drans_batch(s, nj, tabs, L, emax=emax)
    assert bool(jnp.all(d == sigj))


def test_engine_heavy_exceptions():
    B, L = 8, 2048
    sig = _walk(B, L, seed=9, burst=13)  # ~8% exceptions
    n = jnp.full((B,), L, jnp.int32)
    tabs = canned_o1_device_tables()
    s, l = press_drans_batch(jnp.asarray(sig), n, tabs, L)
    d = depress_drans_batch(s, n, tabs, L, emax=L)
    assert bool(jnp.all(d == jnp.asarray(sig)))
    host = drans_press_reads([sig[b] for b in range(B)])
    for b in range(B):
        assert np.asarray(s[b, : int(l[b])]).tobytes() == host[b], b


def test_device_fit_matches_host_fit():
    """fit_tables_device must reproduce the host fit bit-exactly: same
    (f, c) for every (ctx, sym), so streams are identical (VERDICT r4
    item 4 — the fit moved on device)."""
    from honours_tpu.engine.drans import fit_tables_device, make_drans_tables

    rng = np.random.default_rng(3)
    counts = rng.integers(0, 1 << 20, size=(NB, 256)).astype(np.int64)
    counts[rng.random((NB, 256)) < 0.5] = 0
    dev = fit_tables_device(jnp.asarray(counts, jnp.int32))
    host = make_drans_tables(fit_freqs(counts))
    assert np.array_equal(np.asarray(dev["flat_f"]), np.asarray(host["flat_f"]))
    assert np.array_equal(np.asarray(dev["flat_c"]), np.asarray(host["flat_c"]))
    assert np.array_equal(np.asarray(dev["cum_ext"]), np.asarray(host["cum_ext"]))
    # per-(ctx, sym) fc values via each side's own cluster indirection
    for tabs in (dev, host):
        cm = np.asarray(tabs["cmap"])
        fc = np.asarray(tabs["fc_tab"]).reshape(-1)
        vals = fc[cm[:, None] * 256 + np.arange(256)[None, :]]
        f, c = vals & 8191, vals >> 13
        assert np.array_equal(f, np.asarray(tabs["flat_f"]).reshape(257, 256))
        assert np.array_equal(c, np.asarray(tabs["flat_c"]).reshape(257, 256))


def test_group_mismatch_fails_loudly():
    """A stream encoded in a group must refuse to decode in a different
    grouping (ADVICE r4 item 2): the G header makes it a ValueError, not
    silent garbage."""
    sigs = [_walk(1, 2000, seed=i)[0] for i in range(3)]
    sts = drans_press_reads(sigs)
    with pytest.raises(ValueError, match="group mismatch"):
        drans_depress_reads([sts[0]], [sigs[0].size])
    with pytest.raises(ValueError, match="group mismatch"):
        drans_depress_reads(sts[:2], [s.size for s in sigs[:2]])
    # engine decoder raises too
    from honours_tpu.engine.drans import depress_drans_batch
    from honours_tpu.engine.pipeline import canned_o1_device_tables

    L = 2048
    W = max(len(s) for s in sts[:2])
    W = -(-W // 128) * 128
    buf = np.zeros((8, W), np.uint8)
    for j, blob in enumerate(sts[:2]):
        buf[j, : len(blob)] = np.frombuffer(blob, np.uint8)
    n = np.zeros(8, np.int32)
    n[:2] = [s.size for s in sigs[:2]]
    with pytest.raises(ValueError, match="group mismatch"):
        depress_drans_batch(
            jnp.asarray(buf), jnp.asarray(n), canned_o1_device_tables(), L
        )
