"""Signal analysis toolkit.

Python equivalent of the reference's offline viz/ corpus (~70 C/R/shell
tools, viz/README:1-80): the statistics that motivated the codec designs
— value/delta frequency tallies, empirical entropy, exception rates,
quantisation shift, stall segmentation reports, per-read summaries.

Usage:
  python -m honours_tpu.cli analyze FILE.blow5 [--report ...]
  or library: honours_tpu.analysis.analyze_reads(signals)
"""

from __future__ import annotations

import numpy as np

from honours_tpu.transforms.core import find_qts, zigdelta


class Welford:
    """Streaming min/max/mean/var/sd (press/stats.c:62-88 update_stats):
    one-pass over chunks of samples, numerically stable."""

    def __init__(self):
        self.n = 0
        self.mean = 0.0
        self.m2 = 0.0
        self.min = np.inf
        self.max = -np.inf

    def update(self, values) -> "Welford":
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return self
        n2 = v.size
        mean2 = v.mean()
        m22 = ((v - mean2) ** 2).sum()
        delta = mean2 - self.mean
        n = self.n + n2
        self.mean += delta * n2 / n
        self.m2 += m22 + delta * delta * self.n * n2 / n
        self.n = n
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        return self

    @property
    def var(self) -> float:
        return self.m2 / self.n if self.n else 0.0

    @property
    def sd(self) -> float:
        return float(np.sqrt(self.var))


def freq_tally(values: np.ndarray, minlength=0) -> np.ndarray:
    """Value frequency tally (viz/freq_slow5.c / tally.c role)."""
    v = np.asarray(values)
    if v.dtype == np.int16:
        v = v.view(np.uint16)
    return np.bincount(v.astype(np.int64), minlength=minlength)


def entropy_bits(values: np.ndarray) -> float:
    """Empirical order-0 entropy in bits/sample (viz entropy tools;
    reference baseline: raw 7.700, zd 5.391 — thesis entropy-tab)."""
    counts = freq_tally(values)
    counts = counts[counts > 0]
    p = counts / counts.sum()
    return float(-(p * np.log2(p)).sum())


def delta_stats(signal: np.ndarray) -> dict:
    x = np.asarray(signal, dtype=np.int16)
    d = np.diff(x.astype(np.int32))
    zd = zigdelta(x)
    return {
        "delta_mean": float(d.mean()) if d.size else 0.0,
        "delta_std": float(d.std()) if d.size else 0.0,
        "delta_entropy_bits": entropy_bits(zd),
        "exception_rate": float((zd[1:] > 255).mean()) if zd.size > 1 else 0.0,
        "max_abs_delta": int(np.abs(d).max()) if d.size else 0,
    }


def stall_report(signal: np.ndarray) -> dict:
    from honours_tpu import native

    exists, start, length = native.find_stall(np.asarray(signal, np.int16))
    return {"stall": exists, "stall_start": start, "stall_len": length}


def read_summary(signal: np.ndarray) -> dict:
    x = np.asarray(signal, dtype=np.int16)
    out = {
        "n": int(x.size),
        "min": int(x.min()) if x.size else 0,
        "max": int(x.max()) if x.size else 0,
        "mean": float(x.mean()) if x.size else 0.0,
        "sd": float(x.std()) if x.size else 0.0,
        "raw_entropy_bits": entropy_bits(x),
        "qts": find_qts(x) if x.size else 0,
    }
    out.update(delta_stats(x))
    out.update(stall_report(x))
    return out


def analyze_reads(signals) -> dict:
    """Corpus-level report: per-read summaries + aggregate statistics."""
    reads = [read_summary(s) for s in signals]
    all_zd = np.concatenate([zigdelta(s) for s in signals]) if signals else []
    agg = {
        "n_reads": len(signals),
        "total_samples": int(sum(s.size for s in signals)),
        "corpus_raw_entropy_bits": entropy_bits(
            np.concatenate(signals) if signals else np.zeros(0, np.int16)
        ),
        "corpus_zd_entropy_bits": entropy_bits(all_zd),
    }
    return {"aggregate": agg, "reads": reads}


def synthesize_corpus(n_samples: int, seed: int = 0) -> np.ndarray:
    """Deterministic synthetic nanopore-like signal for transfer benches.

    Event/noise model with parameters fitted to the fixture corpus
    (tests/data/three-reads.blow5: mean 460.6, sd 76.8, |d|>30 jump rate
    0.0387 -> mean dwell ~26, median |delta| 5): piecewise-constant event
    levels with geometric dwell plus short-memory AR noise.  This is NOT
    real signal — bench.py labels ratios on it as synthetic transfer; its
    value is that the canned srans/srans2/shuffman tables never saw it.
    """
    from scipy.signal import lfilter

    rng = np.random.default_rng(seed)
    out = np.empty(0, np.float64)
    while out.size < n_samples:
        m = n_samples - out.size
        n_ev = int(m / 26 * 1.3) + 16
        dwell = rng.geometric(1 / 26.0, n_ev)
        lvl = np.clip(rng.normal(461, 72, n_ev), 253, 697)
        out = np.concatenate([out, np.repeat(lvl, dwell)[:m]])
    eps = rng.normal(0, 5.5, n_samples)
    # AR(1) noise with pole 0.55 (the geometric-weight convolution the
    # r2-r4 version computed via a 64-tap sliding window, which is the
    # same filter truncated at 0.55^64 ~ 1e-17; lfilter is ~10x faster,
    # which is what lets bench.py scale the synthetic corpus past 1 GB)
    noise = lfilter([1.0], [1.0, -0.55], eps)
    x = np.rint(out + noise)
    return np.clip(x, -32768, 32767).astype(np.int16)


def conditional_entropy_bits(values: np.ndarray) -> float:
    """Order-1 conditional entropy H(x_t | x_{t-1}) in bits/sample over
    byte-valued data (the statistic that motivates the order-1 srans2
    table; viz entropy-tools role)."""
    v = np.asarray(values).astype(np.int64).ravel()
    if v.size < 2:
        return 0.0
    J = np.zeros((256, 256), dtype=np.float64)
    np.add.at(J, (v[:-1] & 255, v[1:] & 255), 1)
    rows = J.sum(axis=1)
    nz = rows > 0
    P = J[nz] / rows[nz, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        h = -np.where(P > 0, P * np.log2(P), 0).sum(axis=1)
    w = rows[nz] / rows.sum()
    return float((w * h).sum())


def exception_report(signal: np.ndarray) -> dict:
    """Exception (zd > 255) positions/gaps/values statistics — the
    analysis behind the vb container designs (viz ex-tools role,
    press/press.c:2767-2773 framing decisions)."""
    zd = zigdelta(np.asarray(signal, np.int16))[1:]
    pos = np.nonzero(zd > 255)[0]
    gaps = np.diff(pos) if pos.size > 1 else np.zeros(0, np.int64)
    vals = zd[pos].astype(np.int64) - 256
    return {
        "nex": int(pos.size),
        "ex_rate": float(pos.size / max(zd.size, 1)),
        "ex_gap_mean": float(gaps.mean()) if gaps.size else 0.0,
        "ex_gap_max": int(gaps.max()) if gaps.size else 0,
        "ex_val_bits_mean": float(
            np.ceil(np.log2(vals + 1)).mean()
        ) if vals.size else 0.0,
        "ex_val_max": int(vals.max()) if vals.size else 0,
    }


def run_length_report(signal: np.ndarray, tol: int = 0) -> dict:
    """Flat-run statistics (|delta| <= tol) — the analysis behind the
    flats partitioner and stall codecs (viz flats/stall role)."""
    x = np.asarray(signal, np.int64)
    if x.size < 2:
        return {"n_runs": 0, "run_mean": 0.0, "run_max": 0}
    flat = np.abs(np.diff(x)) <= tol
    edges = np.diff(flat.astype(np.int8))
    starts = np.nonzero(edges == 1)[0]
    ends = np.nonzero(edges == -1)[0]
    if flat.size and flat[0]:
        starts = np.concatenate([[-1], starts])
    if flat.size and flat[-1]:
        ends = np.concatenate([ends, [flat.size - 1]])
    lens = ends - starts
    return {
        "n_runs": int(lens.size),
        "run_mean": float(lens.mean()) if lens.size else 0.0,
        "run_max": int(lens.max()) if lens.size else 0,
    }


def value_histogram(values: np.ndarray, bucket: int = 16) -> dict:
    """Bucketed value histogram (viz hist/sigstat role)."""
    v = np.asarray(values).astype(np.int64).ravel()
    if v.size == 0:
        return {"bucket": bucket, "lo": 0, "counts": []}
    lo = int(v.min()) // bucket * bucket
    idx = (v - lo) // bucket
    counts = np.bincount(idx)
    return {"bucket": bucket, "lo": lo, "counts": counts.tolist()}


def method_size_table(signals, methods) -> dict:
    """Compressed-size comparison table over registered codecs (the
    one-off per-method analyses the viz shell scripts drive)."""
    from honours_tpu.codecs import base as registry

    raw = sum(int(np.asarray(s).size) * 2 for s in signals)
    out = {"raw_bytes": raw, "methods": {}}
    for m in methods:
        c = registry.get(m)
        size = sum(len(c.press(np.asarray(s, np.int16))) for s in signals)
        out["methods"][m] = {
            "bytes": size,
            "ratio": round(raw / size, 6) if size else 0.0,
        }
    return out
