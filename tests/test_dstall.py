"""dstall_srans2: host codec + batched engine parity and ratio gates.

The stall-aware flagship (VERDICT r2 item 4): segment.find_stall_batch
composed with srans2 branch codecs and the reference's min-pick
(press/press.c:8003-8019 semantics).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu import native
from honours_tpu.codecs.base import get as get_codec
from honours_tpu.engine.dstall import depress_dstall_batch, press_dstall_batch
from honours_tpu.engine.pipeline import canned_o1_device_tables, pad_batch
from honours_tpu.segment import find_stall_batch


def _stall_signal(rng, n_stall=800, n_rest=3000, base=460):
    """Synthetic read with a flat adaptor stall then active signal."""
    stall = base + rng.integers(-4, 5, n_stall)
    rest = rng.integers(300, 900, n_rest)
    return np.concatenate([stall, rest]).astype(np.int16)


@pytest.fixture(scope="module")
def tabs():
    return canned_o1_device_tables()


def _cases(fixture_reads):
    rng = np.random.default_rng(21)
    return [
        fixture_reads[0],                      # real read (7329)
        fixture_reads[1][:6000],
        _stall_signal(rng),
        _stall_signal(rng, n_stall=2000, n_rest=1000),
        rng.integers(300, 900, 2500).astype(np.int16),  # no stall
        np.full(500, 470, np.int16),
    ]


def test_dstall_host_roundtrip_and_minpick(fixture_reads):
    c = get_codec("dstall_srans2")
    plain = get_codec("srans2_vbbe21_zd")
    for i, s in enumerate(_cases(fixture_reads)):
        blob = c.press(s)
        assert np.array_equal(c.depress(blob, s.size), s), i
        # min-pick bound: never more than 5 framing bytes over srans2
        assert len(blob) <= len(plain.press(s)) + 5, i


def test_dstall_gains_on_stall_reads(fixture_reads):
    """On synthetic stall-bearing reads the split must actually engage
    and not lose to plain srans2."""
    rng = np.random.default_rng(5)
    c = get_codec("dstall_srans2")
    s = _stall_signal(rng, n_stall=4000, n_rest=4000)
    blob = c.press(s)
    assert blob[0] in (0, 1)
    plain = get_codec("srans2_vbbe21_zd")
    assert len(blob) <= len(plain.press(s)) + 5


def test_dstall_engine_byte_parity(fixture_reads, tabs):
    """Engine streams == host streams where the batched segmenter and the
    C oracle agree on boundaries (they do on these signals — asserted)."""
    cases = _cases(fixture_reads)
    sig, n = pad_batch(cases)
    ex_b, st_b, ln_b = find_stall_batch(sig, n)
    for i, s in enumerate(cases):
        e, st, ln = native.find_stall(np.asarray(s, np.int16))
        assert (bool(ex_b[i]), int(st_b[i]), int(ln_b[i])) == (e, st, ln), i
    host = get_codec("dstall_srans2")
    stream, slen = press_dstall_batch(sig, n, tabs)
    for i, s in enumerate(cases):
        got = np.asarray(stream[i, : int(slen[i])]).tobytes()
        assert got == host.press(s), i


def test_dstall_engine_roundtrip(fixture_reads, tabs):
    cases = _cases(fixture_reads)
    sig, n = pad_batch(cases)
    L = sig.shape[1]
    stream, _ = press_dstall_batch(sig, n, tabs)
    out = np.asarray(depress_dstall_batch(stream, n, tabs, L))
    for i, s in enumerate(cases):
        assert np.array_equal(out[i, : s.size], s), i


def test_dstall_engine_decodes_host_streams(fixture_reads, tabs):
    cases = _cases(fixture_reads)
    host = get_codec("dstall_srans2")
    blobs = [host.press(s) for s in cases]
    sig, n = pad_batch(cases)
    L = sig.shape[1]
    W = -(-max(len(b) for b in blobs) // 128) * 128
    buf = np.zeros((len(blobs), W), np.uint8)
    for i, b in enumerate(blobs):
        buf[i, : len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(depress_dstall_batch(jnp.asarray(buf), n, tabs, L))
    for i, s in enumerate(cases):
        assert np.array_equal(out[i, : s.size], s), i


def test_dstall_runner_path(fixture_reads):
    from honours_tpu.engine import runner

    cases = _cases(fixture_reads)[:4]
    streams = runner.press_signals_tpu(cases, "dstall_srans2")
    host = get_codec("dstall_srans2")
    for s, b in zip(cases, streams):
        assert b == host.press(s)
    back = runner.depress_signals_tpu(
        streams, [s.size for s in cases], "dstall_srans2"
    )
    for s, d in zip(cases, back):
        assert np.array_equal(s, d)


# ---------------------------------------------------------------------------
# knife-edge cases (VERDICT r3 item 7): stall boundaries engineered to sit
# exactly at the threshold/margin/window edges, plus float-accumulation
# stress.  The format guarantee is CROSS-DECODABILITY, not cross-encoder
# determinism: the boundary is stored in the stream, so decode never
# consults the segmenter — any encoder's stream decodes on any path.
# Byte parity additionally holds whenever the batched segmenter and the
# C oracle agree on boundaries; the parametrized cases assert agreement
# explicitly, so a platform where they diverge fails loudly here instead
# of silently shipping different (but still lossless) streams.
# ---------------------------------------------------------------------------


def _stall_exact(rng, stall_len, n_rest=2000, base=460, jitter=4):
    """Stall of EXACTLY stall_len in-band samples then violently active
    signal (keeps the jnn run from extending past the construction)."""
    stall = base + rng.integers(-jitter, jitter + 1, stall_len)
    rest = np.empty(n_rest, np.int64)
    rest[0::2] = rng.integers(0, 60, (n_rest + 1) // 2)
    rest[1::2] = rng.integers(1100, 1200, n_rest // 2)
    return np.concatenate([stall, rest]).astype(np.int16)


def _knife_cases():
    rng = np.random.default_rng(77)
    thr, margin, window = 140, 20, 150
    cases = []
    # threshold edge: raw stall length at thr-1 / thr / thr+1
    for d in (-1, 0, 1):
        cases.append(("thr%+d" % d, _stall_exact(rng, thr + d)))
    # margin edge: trimmed length 2*margin-1 / 2*margin / 2*margin+1
    for d in (-1, 0, 1):
        cases.append(("margin%+d" % d, _stall_exact(rng, 2 * margin + d)))
    # window edge: first-segment early-emit at window*STALL_LEN and the
    # full window count
    for ln in (int(window * 0.25), int(window * 0.25) + 1, window, window + 1):
        cases.append(("win%d" % ln, _stall_exact(rng, ln)))
    # float-accumulation stress: long alternating-extreme read (serial
    # f32 mean/std vs batched f64-then-f32 rounding)
    x = np.empty(120000, np.int64)
    x[0::2] = rng.integers(0, 40, 60000)
    x[1::2] = rng.integers(1150, 1200, 60000)
    x[:700] = 460 + rng.integers(-3, 4, 700)
    cases.append(("floatstress", x.astype(np.int16)))
    # u16 guard: stall starting beyond 65535
    y = np.concatenate([
        rng.integers(300, 900, 66000),
        460 + rng.integers(-3, 4, 3000),
        rng.integers(300, 900, 2000),
    ]).astype(np.int16)
    cases.append(("u16start", y))
    return cases


@pytest.mark.parametrize("name,sig", _knife_cases(), ids=[c[0] for c in _knife_cases()])
def test_dstall_knife_edge(name, sig, tabs):
    host = get_codec("dstall_srans2")
    blob = host.press(sig)
    # 1. host round trip at the edge
    assert np.array_equal(host.depress(blob, sig.size), sig)

    sigb, nb = pad_batch([sig])
    L = sigb.shape[1]
    # 2. segmenter agreement is asserted explicitly (this is the knife
    # edge: fail loudly if the batched and C segmenters ever diverge)
    e, st, ln = native.find_stall(np.asarray(sig, np.int16))
    ex_b, st_b, ln_b = find_stall_batch(sigb, nb)
    assert (bool(ex_b[0]), int(st_b[0]), int(ln_b[0])) == (e, st, ln), (
        name, (e, st, ln), (bool(ex_b[0]), int(st_b[0]), int(ln_b[0])))

    # 3. engine encode byte parity + round trip
    stream, slen = press_dstall_batch(sigb, nb, tabs)
    assert np.asarray(stream[0, : int(slen[0])]).tobytes() == blob, name
    out = np.asarray(depress_dstall_batch(stream, nb, tabs, L))
    assert np.array_equal(out[0, : sig.size], sig), name

    # 4. cross-decode: engine decodes the host stream (boundary comes
    # from the stream, not the segmenter)
    W = -(-len(blob) // 128) * 128
    buf = np.zeros((1, W), np.uint8)
    buf[0, : len(blob)] = np.frombuffer(blob, np.uint8)
    out2 = np.asarray(depress_dstall_batch(jnp.asarray(buf), nb, tabs, L))
    assert np.array_equal(out2[0, : sig.size], sig), name
