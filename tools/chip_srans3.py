#!/usr/bin/env python3
"""Chip timing for srans3 (nibble o1) + srans (o0) enc/dec — the decode
formats whose table materialization is 16/256-wide."""
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

B = 256
L = 1 << 16
EMAX = L // 16


def build_batch():
    from honours_tpu.io.blow5 import read_signals

    reads = read_signals("tests/data/three-reads.blow5")
    chunks = []
    for s in reads:
        for i in range(0, s.size - L + 1, L):
            chunks.append(s[i : i + L])
    while len(chunks) < B:
        chunks = chunks + chunks
    return np.stack(chunks[:B])


def sync(x):
    float(jnp.sum(jnp.ravel(jax.tree.leaves(x)[0])[:1].astype(jnp.float32)))


def timed(fn, reps=5):
    r = fn()
    sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    sync(r)
    return (time.time() - t0) / reps


def main():
    base = build_batch()
    sig = jnp.asarray(base)
    n = jnp.full((B,), L, jnp.int32)
    nbytes = base.size * 2

    from honours_tpu.engine.pipeline import (
        canned_o1n_device_tables,
        canned_rans_tables,
        depress_srans3_batch,
        depress_srans_batch,
        press_srans3_batch,
        press_srans_batch,
    )

    tabs3 = canned_o1n_device_tables()
    s3, l3 = press_srans3_batch(sig, n, tabs3, EMAX)
    d3 = depress_srans3_batch(s3, n, tabs3, L, emax=EMAX)
    ok = bool(jnp.all(d3 == sig))
    ratio = nbytes / int(jnp.sum(l3))
    te = timed(lambda: press_srans3_batch(sig, n, tabs3, EMAX)[1])
    td = timed(lambda: depress_srans3_batch(s3, n, tabs3, L, emax=EMAX))
    print(f"srans3: enc {nbytes/te/1e9:.3f} GB/s dec {nbytes/td/1e9:.3f} "
          f"GB/s ratio {ratio:.4f} lossless={ok}", flush=True)

    freqs, cum = canned_rans_tables()
    s1, l1 = press_srans_batch(sig, n, freqs, cum, EMAX)
    d1 = depress_srans_batch(s1, n, freqs, cum, L, emax=EMAX)
    ok = bool(jnp.all(d1 == sig))
    ratio = nbytes / int(jnp.sum(l1))
    te = timed(lambda: press_srans_batch(sig, n, freqs, cum, EMAX)[1])
    td = timed(lambda: depress_srans_batch(s1, n, freqs, cum, L, emax=EMAX))
    print(f"srans:  enc {nbytes/te/1e9:.3f} GB/s dec {nbytes/td/1e9:.3f} "
          f"GB/s ratio {ratio:.4f} lossless={ok}", flush=True)


if __name__ == "__main__":
    main()
