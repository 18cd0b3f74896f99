"""Quick chip benchmark of the srans/srans2 pipelines after kernel work.

Prints enc/dec wall times and GB/s for the [256, 64Ki] fixture batch plus
lossless/parity checks. Run on the real TPU (no env overrides).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from honours_tpu.engine.pipeline import (
    canned_o1_device_tables, canned_rans_tables,
    press_srans2_batch, depress_srans2_batch,
    press_srans_batch, depress_srans_batch,
)
from honours_tpu.io.blow5 import read_signals

B, L = 256, 1 << 16
EMAX = L // 16
reads = read_signals("tests/data/three-reads.blow5")
chunks = []
for s in reads:
    for i in range(0, s.size - L + 1, L):
        chunks.append(s[i:i + L])
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
    leaves = jax.tree.leaves(r)
    float(jnp.sum(jnp.ravel(leaves[0])[:1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    leaves = jax.tree.leaves(r)
    float(jnp.sum(jnp.ravel(leaves[0])[:1].astype(jnp.float32)))
    dt = max((time.time() - t0 - RTT) / reps, 1e-9)
    print(f"{name:28s} {dt*1e3:8.2f} ms  {NB/dt/1e9:6.2f} GB/s", flush=True)
    return r, dt


tabs = canned_o1_device_tables()
(s3, l3), te = timed("srans2 encode", lambda: press_srans2_batch(sig, n, tabs, EMAX))
d3, td = timed("srans2 decode", lambda: depress_srans2_batch(s3, n, tabs, L, emax=EMAX))
ok = bool(jnp.all(d3 == sig))
from honours_tpu.codecs.base import get as get_codec
host = get_codec("srans2_vbbe21_zd").press(base[0])
parity = np.asarray(s3[0, : int(l3[0])]).tobytes() == host
print(f"srans2: lossless={ok} parity={parity} ratio="
      f"{NB/ int(jnp.sum(l3)):.4f}", flush=True)

freqs, cum = canned_rans_tables()
(s2, l2), te2 = timed("srans encode", lambda: press_srans_batch(sig, n, freqs, cum, EMAX))
d2, td2 = timed("srans decode", lambda: depress_srans_batch(s2, n, freqs, cum, L, emax=EMAX))
ok2 = bool(jnp.all(d2 == sig))
print(f"srans: lossless={ok2}", flush=True)
print(f"SUMMARY srans2 enc {NB/te/1e9:.2f} dec {NB/td/1e9:.2f} | "
      f"srans enc {NB/te2/1e9:.2f} dec {NB/td2/1e9:.2f} GB/s", flush=True)
