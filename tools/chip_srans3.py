"""Chip benchmark: srans3 (nibble v4) vs srans2, full pipelines."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from honours_tpu.engine.pipeline import (
    canned_o1_device_tables, canned_o1n_device_tables,
    press_srans2_batch, depress_srans2_batch,
    press_srans3_batch, depress_srans3_batch,
)
from honours_tpu.io.blow5 import read_signals

B, L = 256, 1 << 16
EMAX = L // 16
reads = read_signals("tests/data/three-reads.blow5")
chunks = []
for s in reads:
    for i in range(0, s.size - L + 1, L):
        chunks.append(s[i:i + L])
n_unique = len(chunks)
while len(chunks) < B:
    chunks = chunks + chunks
base = np.stack(chunks[:B])
sig = jnp.asarray(base)
n = jnp.full((B,), L, jnp.int32)
NB = B * L * 2

x = jnp.zeros((), jnp.float32) + 1
float(x)
t0 = time.time()
for _ in range(5):
    float(x + 1)
RTT = (time.time() - t0) / 5
print(f"RTT {RTT*1e3:.1f} ms", flush=True)


def timed(name, fn, reps=8):
    r = fn()
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    dt = max((time.time() - t0 - RTT) / reps, 1e-9)
    print(f"{name:24s} {dt*1e3:8.2f} ms  {NB/dt/1e9:6.2f} GB/s", flush=True)
    return r, dt


tabs3 = canned_o1n_device_tables()
(s3, l3), te3 = timed("srans3 encode", lambda: press_srans3_batch(sig, n, tabs3, EMAX))
d3, td3 = timed("srans3 decode", lambda: depress_srans3_batch(s3, n, tabs3, L, emax=EMAX))
ok3 = bool(jnp.all(d3 == sig))
from honours_tpu.codecs.base import get as get_codec
host3 = get_codec("srans3_vbbe21_zd").press(base[0])
par3 = np.asarray(s3[0, : int(l3[0])]).tobytes() == host3
ratio3 = n_unique * L * 2 / int(jnp.sum(l3[:n_unique]))
print(f"srans3: lossless={ok3} parity={par3} ratio={ratio3:.4f}", flush=True)

tabs2 = canned_o1_device_tables()
(s2, l2), te2 = timed("srans2 encode", lambda: press_srans2_batch(sig, n, tabs2, EMAX))
d2, td2 = timed("srans2 decode", lambda: depress_srans2_batch(s2, n, tabs2, L, emax=EMAX))
ok2 = bool(jnp.all(d2 == sig))
ratio2 = n_unique * L * 2 / int(jnp.sum(l2[:n_unique]))
print(f"srans2: lossless={ok2} ratio={ratio2:.4f}", flush=True)
print(f"SUMMARY srans3 enc {NB/te3/1e9:.2f} dec {NB/td3/1e9:.2f} | "
      f"srans2 enc {NB/te2/1e9:.2f} dec {NB/td2/1e9:.2f} GB/s", flush=True)
