"""Offline evaluation: nibble-factorized order-1 model vs the byte o1 model.

Measures exact coding cost (bits) of the fixture residual streams under:
  A) the canned byte-level o1 table (srans2's model),
  B) the derived nibble factorization P(hi|cl(prev)) * P(lo|cl(prev),hi)
     with the lo-context (cl, hi) pairs clustered to rL rows.
Both with 12-bit quantized tables, so the numbers are what rANS would pay.
"""
import sys
import numpy as np

sys.path.insert(0, ".")
from honours_tpu.kernels.rans import M, normalize_freqs
from honours_tpu.tables.o1 import canned_o1_freqs, fixture_streams, _cluster_contexts

T = np.asarray(canned_o1_freqs(), np.int64)  # [257, 256], rows sum to M
urows, cmap = np.unique(T, axis=0, return_inverse=True)
r = urows.shape[0]
print("byte-level clusters r =", r)

streams = fixture_streams()
data = np.concatenate(streams)
prev = np.concatenate([np.concatenate([[256], s[:-1].astype(np.int64)])
                       for s in streams])
sym = data.astype(np.int64)
cl = cmap[prev]

# A) byte model cost
pU = urows / M
bits_A = -np.log2(pU[cl, sym]).sum()
print(f"A byte-o1: {bits_A / sym.size:.4f} bits/byte")

# B) nibble factorization
hi, lo = sym >> 4, sym & 15
Trows = urows.reshape(r, 16, 16)
H = Trows.sum(axis=2)  # [r, 16] hi freqs, rows sum to M exactly
# H rows already sum to M and cells >= 16 — usable as-is
lo_rows = Trows.reshape(r * 16, 16).astype(np.float64)  # counts within block
lo_w = lo_rows.sum(axis=1)

for rL in (32, 64, 128, 256):
    if rL >= r * 16:
        assign = np.arange(r * 16)
        crows = lo_rows
    else:
        assign, crows = _cluster_contexts(lo_rows + 1e-9, rL)
    # quantize each lo cluster row to 12-bit
    Lq = np.zeros((len(crows), 16), np.int64)
    for j in range(len(crows)):
        Lq[j] = normalize_freqs(
            np.pad((crows[j] * (1 << 20)).astype(np.int64), (0, 240))
        )[:16]
        if Lq[j].sum() != M:  # pad trick may spill; renormalize strictly
            q = (crows[j] / crows[j].sum() * M).astype(np.int64)
            q[q == 0] = 1
            while q.sum() != M:
                q[np.argmax(q)] += M - q.sum() if q.sum() < M else -1
            Lq[j] = q
    pH = H / M
    pL = Lq / M
    gl = assign[cl * 16 + hi]
    bits_B = -(np.log2(pH[cl, hi]) + np.log2(pL[gl, lo])).sum()
    print(f"B nibble rL={rL}: {bits_B / sym.size:.4f} bits/byte "
          f"(delta {100*(bits_B-bits_A)/bits_A:+.2f}%)")
