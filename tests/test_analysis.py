"""Analysis toolkit (the viz/ role): statistics, reports, synthesis."""

import numpy as np
import pytest

from honours_tpu import analysis as A


def test_welford_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(100, 7, 50000)
    w = A.Welford()
    for i in range(0, x.size, 1333):
        w.update(x[i : i + 1333])
    assert abs(w.mean - x.mean()) < 1e-9
    assert abs(w.sd - x.std()) < 1e-9
    assert w.min == x.min() and w.max == x.max() and w.n == x.size


def test_conditional_entropy_below_order0(fixture_reads):
    from honours_tpu.transforms.core import zigdelta

    zd = (zigdelta(fixture_reads[1])[1:] & 255).astype(np.uint8)
    h1 = A.conditional_entropy_bits(zd)
    h0 = A.entropy_bits(zd)
    assert 0 < h1 < h0  # conditioning always helps on real signal


def test_exception_report(fixture_reads):
    r = A.exception_report(fixture_reads[0])
    assert r["nex"] >= 0 and 0 <= r["ex_rate"] < 0.05
    burst = np.tile(np.array([0, 30000], np.int16), 50)
    rb = A.exception_report(burst)
    assert rb["nex"] == 99 and rb["ex_val_max"] > 50000


def test_run_length_and_histogram(fixture_reads):
    flat = np.full(100, 7, np.int16)
    r = A.run_length_report(flat)
    assert r["n_runs"] == 1 and r["run_max"] == 99
    h = A.value_histogram(fixture_reads[0], bucket=32)
    assert sum(h["counts"]) == fixture_reads[0].size


def test_synthesize_corpus_deterministic_and_plausible():
    a = A.synthesize_corpus(50000, seed=3)
    b = A.synthesize_corpus(50000, seed=3)
    assert np.array_equal(a, b)
    assert a.dtype == np.int16
    assert 300 < a.mean() < 600 and 30 < a.std() < 120


def test_method_size_table(fixture_reads):
    t = A.method_size_table(fixture_reads[:1], ["none", "vbbe21_zd"])
    assert t["methods"]["none"]["ratio"] == pytest.approx(1.0, abs=1e-3)
    assert t["methods"]["vbbe21_zd"]["ratio"] > 1.9
