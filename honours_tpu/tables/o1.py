"""Canned order-1 CDF table for the srans2 flagship.

257 rows x 256 symbols of 12-bit frequencies (each row sums to M = 4096,
every cell >= 1 so ANY byte stream is encodable).  Row `c` < 256 models
P(byte | previous byte = c); row 256 is the marginal, used as the virtual
context of each rANS lane's first symbol (kernels/rans.py CTX0).

Training data: the vbbe21 residual byte streams of the three NA12878
reads in tests/data/three-reads.blow5 — the same "canned table trained
on the benchmark data set" methodology the reference uses for its static
Huffman table (press/gen_huffman.c:11-16 builds NA12878_zd.huffman from
NA12878 frequencies and press/test.c benches on NA12878).  The raw
order-1 counts are shrunk towards the marginal (SHRINK pseudo-counts
per row) so the table generalizes.

The 257 contexts are then CLUSTERED to R_CLUSTERS distinct rows
(deterministic Hellinger k-means, farthest-point init).  This costs
~0.3% compression in-sample (5.275 vs 5.259 bits/residual-byte) and
NOTHING held-out (5.382 vs 5.384 cross-read — clustering regularizes),
while letting the TPU engine do the f/cum lookups against a 64-row
table: the one-hot row-select matmul shrinks 4x (engine/entropy_o1.py
recovers the structure via np.unique, no metadata needed).

The committed artifact is zlib(uint16 LE [257, 256]) at
tables/na12878_o1.bin.z; `build_o1_freqs` regenerates it deterministically
(tests/test_srans2.py asserts the regeneration matches byte-for-byte).
"""

from __future__ import annotations

import zlib
from pathlib import Path

import numpy as np

from honours_tpu.kernels.rans import M, normalize_freqs

SHRINK = 200.0
R_CLUSTERS = 64
_SCALE = 1 << 20
_PATH = Path(__file__).parent / "na12878_o1.bin.z"

_CACHE = None


def _cluster_contexts(counts: np.ndarray, r: int, iters: int = 30):
    """Deterministic Hellinger k-means over context count rows.

    counts [C, 256] float64 (strictly positive).  Returns
    (assign [C] int, crows [r, 256] count-sums of each cluster).
    Farthest-point init starting from the heaviest row; fixed iteration
    count; ties resolved by argmin/argmax first-index so the result is
    platform-independent in float64.
    """
    w = counts.sum(axis=1)
    P = counts / w[:, None]
    X = np.sqrt(P)
    cent = [int(np.argmax(w))]
    d2 = ((X - X[cent[0]]) ** 2).sum(axis=1)
    for _ in range(r - 1):
        cent.append(int(np.argmax(d2 * w)))
        d2 = np.minimum(d2, ((X - X[cent[-1]]) ** 2).sum(axis=1))
    C = X[cent].copy()
    assign = np.zeros(counts.shape[0], dtype=np.int64)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(r):
            sel = assign == j
            if sel.any():
                cj = np.sqrt(np.average(P[sel], axis=0, weights=w[sel]))
                C[j] = cj / np.linalg.norm(cj)
    crows = np.zeros((r, counts.shape[1]), dtype=np.float64)
    for j in range(r):
        sel = assign == j
        crows[j] = counts[sel].sum(axis=0) if sel.any() else counts.sum(axis=0)
    return assign, crows


def build_o1_freqs(streams) -> np.ndarray:
    """Deterministic [257, 256] int64 table from training byte streams."""
    J = np.zeros((256, 256), dtype=np.float64)
    m = np.zeros(256, dtype=np.float64)
    for s in streams:
        s = np.asarray(s, dtype=np.uint8)
        if s.size > 1:
            np.add.at(J, (s[:-1].astype(np.int64), s[1:].astype(np.int64)), 1)
        m += np.bincount(s, minlength=256)
    marg = m + 1.0
    marg /= marg.sum()
    counts = np.concatenate([J + SHRINK * marg[None, :], marg[None, :]])
    assign, crows = _cluster_contexts(counts, R_CLUSTERS)
    rows = np.zeros((R_CLUSTERS, 256), dtype=np.int64)
    for j in range(R_CLUSTERS):
        # float -> exact integers before the deterministic normalizer
        rows[j] = normalize_freqs((crows[j] * _SCALE).astype(np.int64))
    out = rows[assign]
    assert (out >= 1).all() and (out.sum(axis=1) == M).all()
    return out


def fixture_streams():
    """vbbe21 residual byte streams of the committed fixture reads."""
    from honours_tpu.codecs.vb import PAYLOAD, exblock_len
    from honours_tpu.io.blow5 import read_signals
    from honours_tpu.transforms.core import zigdelta

    root = Path(__file__).resolve().parents[2]
    reads = read_signals(str(root / "tests" / "data" / "three-reads.blow5"))
    streams = []
    for s in reads:
        zd = zigdelta(np.asarray(s, dtype=np.int16))
        vb = PAYLOAD["vbbe21"][0](zd[1:])
        exlen = exblock_len(vb, 0, "vbbe21")
        streams.append(np.frombuffer(vb, dtype=np.uint8, offset=exlen).copy())
    return streams


def save_o1_freqs(tab: np.ndarray, path: Path = _PATH) -> None:
    raw = np.asarray(tab, dtype="<u2").tobytes()
    path.write_bytes(zlib.compress(raw, 9))


def canned_o1_freqs() -> np.ndarray:
    """The committed NA12878 order-1 table, [257, 256] int64."""
    global _CACHE
    if _CACHE is None:
        raw = zlib.decompress(_PATH.read_bytes())
        _CACHE = (
            np.frombuffer(raw, dtype="<u2").astype(np.int64).reshape(257, 256)
        )
    return _CACHE


_HELDOUT_CACHE = None


def heldout_o1_freqs() -> np.ndarray:
    """Order-1 table trained on fixture read 0 ONLY (7,329 samples).

    The held-out scoring protocol: tables from read 0, ratios measured
    on reads 1-2 (155,185 / 95,350 samples) — data the table never saw.
    Deterministic (same clustering/normalization as the canned table)."""
    global _HELDOUT_CACHE
    if _HELDOUT_CACHE is None:
        _HELDOUT_CACHE = build_o1_freqs(fixture_streams()[:1])
    return _HELDOUT_CACHE
