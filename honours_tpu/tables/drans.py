"""drans table fitting — the self-contained dynamic order-1 model.

The drans_vbbe21_zd codec ships NO table bytes: the first quarter of the
rANS lane grid is coded with the canned o1 table (tables/o1.py), a
bucketed order-1 histogram of those prefix symbols is fitted by BOTH
encoder and decoder identically, and the remaining three quarters are
coded with the fitted table.  This is the TPU-native analogue of the
reference's adaptive coders (rcmsenc context mixing, press/press.c:6531+)
and of its dynamic Huffman, which likewise builds its model from the
data being coded (press/huffman/huffman.c:373-424) — except the model
update happens once at a format-defined boundary instead of per byte,
so encode and decode stay lane-parallel.

Everything here is exact integer arithmetic so the host codec and the
TPU engine fit bit-identical tables.
"""

from __future__ import annotations

import numpy as np

from honours_tpu.kernels.rans import CTX0, M, normalize_freqs

#: fitted-count weight: effective counts = prefix_counts * W_FIT + base
#: (base = canned model bucket rows, so sparse prefixes degrade to the
#: canned table instead of to noise).  W chosen on fixture + synthetic
#: sweeps (tools; fixture 3.0013 / synthetic 3.1309 at W=4).
W_FIT = 4
#: prefix fraction: lane-grid steps t < ceil(S / PREFIX_DEN) are coded
#: with the canned table and feed the fit.
PREFIX_DEN = 4
#: number of context buckets (<= 64 so the fitted table rides the same
#: 64-cluster engine tables as the canned one)
NB = 58

_THRESHOLDS = (48, 56, 64, 80, 96, 128, 160, 192, 224)


def bucket_of(ctx):
    """Closed-form context bucket map (works on np or jnp arrays).

    ctx 0..47 -> own bucket; [48,56) [56,64) [64,80) [80,96) [96,128)
    [128,160) [160,192) [192,224) [224,256) -> buckets 48..56;
    CTX0 (256) -> 57.  Arithmetic only — no gather — so the TPU engine
    can bucket 4M contexts without a lookup table.
    """
    b = ctx * 0 + 47
    for lo in _THRESHOLDS:
        b = b + (ctx >= lo)
    b = b + (ctx >= 256)  # CTX0 -> 57
    small = ctx < _THRESHOLDS[0]
    return small * ctx + (1 - small) * b


_BASE = None


def base_rows() -> np.ndarray:
    """[NB, 256] canned-model bucket rows (each sums to M)."""
    global _BASE
    if _BASE is None:
        from honours_tpu.tables.o1 import canned_o1_freqs

        canned = canned_o1_freqs().astype(np.int64)
        bmap = np.asarray(bucket_of(np.arange(257, dtype=np.int64)))
        _BASE = np.stack(
            [normalize_freqs(canned[bmap == r].sum(axis=0)) for r in range(NB)]
        )
    return _BASE


def dnorm(e: np.ndarray) -> np.ndarray:
    """Deterministic vectorized normalization of one count row to sum M.

    Each present symbol gets >= 1; the fractional remainders of the
    proportional split are resolved by rank (largest remainder first,
    ties to the lower symbol index).  Pure integer arithmetic, and every
    intermediate fits int32 (counts are first rescaled so the row total
    is < 2^18, making e*t < 2^31) — the SAME arithmetic runs on-device
    in engine/drans.fit_tables_device, so host and TPU fits are
    bit-identical without int64 device support.
    """
    e = np.asarray(e, dtype=np.int64)
    present = (e > 0).astype(np.int64)
    npres = int(present.sum())
    tot = int(e.sum())
    assert tot > 0
    # prescale: tot' <= 2^17 + npres < 2^18, so e*t below stays in int32
    s = (tot >> 17) + 1
    e = np.maximum(e // s, present)
    tot = int(e.sum())
    t = M - npres
    q = (e * t) // tot
    rem = e * t - q * tot
    f = q + present
    diff = M - int(f.sum())  # in [0, npres)
    key = rem * 256 + (255 - np.arange(256, dtype=np.int64))
    order = np.argsort(-key, kind="stable")
    f[order[:diff]] += 1
    return f


def fit_freqs(counts: np.ndarray) -> np.ndarray:
    """[NB, 256] prefix counts -> [257, 256] fitted o1 table.

    Rows sum to M.  The base rows are sums of canned rows (every cell
    >= 1), so every symbol stays encodable even when the prefix never
    saw it — suffix symbols are NOT restricted to the prefix alphabet.
    """
    base = base_rows()
    eff = np.asarray(counts, dtype=np.int64) * W_FIT + base
    rows = np.stack([dnorm(eff[r]) for r in range(NB)])
    bmap = np.asarray(bucket_of(np.arange(257, dtype=np.int64)))
    return rows[bmap]


def prefix_steps(S: int) -> int:
    """Format-defined table-switch step: t < T0 canned, t >= T0 fitted."""
    return -(-S // PREFIX_DEN)


def prefix_counts_grid(grid: np.ndarray, n: int, S: int) -> np.ndarray:
    """Histogram (bucket(ctx), sym) over valid lane-grid positions with
    t < prefix_steps(S).  grid [K, S] int; ctx = in-lane predecessor,
    CTX0 at t = 0.  Returns [NB, 256] int64."""
    K = grid.shape[0]
    counts = np.zeros((NB, 256), dtype=np.int64)
    if S == 0:
        return counts
    T0 = prefix_steps(S)
    ctx = np.full((K, S), CTX0, dtype=np.int64)
    ctx[:, 1:] = grid[:, :-1]
    valid = (np.arange(K)[:, None] * S + np.arange(S)[None, :]) < n
    m = valid[:, :T0]
    np.add.at(
        counts,
        (np.asarray(bucket_of(ctx[:, :T0][m])), grid[:, :T0][m].astype(np.int64)),
        1,
    )
    return counts
