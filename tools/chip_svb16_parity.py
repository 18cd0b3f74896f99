"""Chip parity: fused svb16 kernels vs the XLA+walk engine, ragged
lengths and multiple L.  Run on real TPU before making fused the default."""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from honours_tpu.engine.svb16_fused import svb16_encode_fused, svb16_decode_fused
from honours_tpu.kernels.svb import svb16_encode as host_encode
from honours_tpu.transforms.core import zigdelta


def host_ref(sig_row, zd):
    vals = zigdelta(sig_row) if zd else sig_row.astype(np.uint16)
    return host_encode(vals)

rng = np.random.default_rng(7)
fails = 0
for L in (4096, 16384, 65536):
    B = 16
    sig = rng.integers(-2048, 2048, size=(B, L), dtype=np.int16)
    # bursty deltas to force 2-byte fields
    sig[:, ::17] = rng.integers(-32768, 32767, size=(B, (L + 16) // 17))
    n = rng.integers(1, L + 1, size=(B,)).astype(np.int32)
    n[0] = L
    n[1] = 1
    n[2] = 8
    n[3] = 9
    n[4] = 127
    n[5] = 128
    n[6] = 129
    for zd in (True, False):
        import time
        t0 = time.time()
        st, ol = svb16_encode_fused(jnp.asarray(sig), jnp.asarray(n), zd=zd)
        jax.block_until_ready(st)
        print(f"L={L} zd={zd} enc compiled+ran in {time.time()-t0:.1f}s",
              flush=True)
        st_np, ol_np = np.asarray(st), np.asarray(ol)
        for b in range(B):
            ref = host_ref(sig[b, : n[b]], zd)
            if not (ol_np[b] == len(ref) and bytes(st_np[b, : ol_np[b]]) == ref):
                print(f"ENC MISMATCH L={L} zd={zd} b={b} n={n[b]}")
                fails += 1
        dec = np.asarray(svb16_decode_fused(st, jnp.asarray(n), L, zd=zd))
        for b in range(B):
            if not np.array_equal(dec[b, : n[b]], sig[b, : n[b]]):
                print(f"DEC MISMATCH L={L} zd={zd} b={b} n={n[b]}")
                fails += 1
    print(f"L={L}: done", flush=True)
print("PARITY", "FAIL" if fails else "OK", flush=True)
sys.exit(1 if fails else 0)
