"""Nibble-factorized order-1 tables for the srans3 flagship (format v4).

Derived DETERMINISTICALLY from the canned byte-level o1 table
(tables/o1.py): P(b | cl) = P(hi | cl) * P(lo | cl, hi) is an exact
factorization, so no new training data is involved —
  H[cl, hi]  = sum_lo T[cl, hi*16+lo]        (sums to M exactly)
  lo rows    = T[cl, hi*16 : hi*16+16] blocks, Hellinger-clustered to
               R_LO rows and requantized to M
Measured cost of the factorization + lo clustering: +0.33% bits/byte at
R_LO = 64 on the fixture residuals (tools/nibble_model_eval.py) — in
exchange the TPU decode symbol search runs 16-wide instead of 256-wide.
"""

from __future__ import annotations

import numpy as np

from honours_tpu.kernels.rans import M
from honours_tpu.tables.o1 import _cluster_contexts, canned_o1_freqs

R_LO = 64

_CACHE = None


def _quant16(row: np.ndarray) -> np.ndarray:
    """[16] positive float counts -> int64 summing to M, cells >= 1."""
    q = np.maximum((row / row.sum() * M).astype(np.int64), 1)
    order = np.argsort(-q, kind="stable")
    i = 0
    while q.sum() != M:
        s = order[i % 16]
        if q.sum() < M:
            q[s] += 1
        elif q[s] > 1:
            q[s] -= 1
        i += 1
    return q


def build_nibble_tables(freq_tab: np.ndarray, r_lo: int = R_LO) -> dict:
    """[257, 256] byte o1 table -> dict(H, L, cmap, lo_assign)."""
    T = np.asarray(freq_tab, np.int64)
    urows, cmap = np.unique(T, axis=0, return_inverse=True)
    r = urows.shape[0]
    Trows = urows.reshape(r, 16, 16)
    H = Trows.sum(axis=2)  # [r, 16], rows sum to M, cells >= 16
    lo_rows = Trows.reshape(r * 16, 16).astype(np.float64)
    assign, crows = _cluster_contexts(lo_rows + 1e-9, r_lo)
    L = np.stack([_quant16(crows[j]) for j in range(r_lo)])
    assert (H.sum(axis=1) == M).all() and (L.sum(axis=1) == M).all()
    return dict(
        H=H,
        L=L,
        cmap=cmap.astype(np.int64),
        lo_assign=assign.astype(np.int64),
    )


def canned_nibble_tables() -> dict:
    global _CACHE
    if _CACHE is None:
        _CACHE = build_nibble_tables(canned_o1_freqs())
    return _CACHE
