"""drans chip check: enc/dec throughput + host parity after the r5
single-jit on-device fit (VERDICT r4 item 4: target >= 0.5 GB/s each
way, no host transfer between decode phases)."""

import sys
import time

import numpy as np
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, ".")
from honours_tpu.engine.pipeline import canned_o1_device_tables
from honours_tpu.engine.drans import depress_drans_batch, press_drans_batch
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
sig = jnp.asarray(np.stack(chunks[:B]))
n = jnp.full((B,), L, jnp.int32)
tabs = canned_o1_device_tables()

x = jnp.zeros((), jnp.float32) + 1
float(x)
t0 = time.time()
for _ in range(5):
    float(x + 1)
RTT = (time.time() - t0) / 5
print(f"RTT {RTT*1e3:.1f} ms", file=sys.stderr)
NB = B * L * 2


def timed(name, fn, reps=4):
    r = fn()
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    dt = max((time.time() - t0 - RTT) / reps, 1e-9)
    print(f"{name:32s} {dt*1e3:8.2f} ms  {NB/dt/1e9:7.2f} GB/s")
    return r, dt


(st, sl), t_enc = timed("press_drans_batch", lambda: press_drans_batch(sig, n, tabs, EMAX))
_, t_dec = timed("depress_drans_batch", lambda: depress_drans_batch(st, n, tabs, L, emax=EMAX))
d = depress_drans_batch(st, n, tabs, L, emax=EMAX)
print("lossless:", bool(jnp.all(d == sig)))
ratio = NB / int(jnp.sum(sl))
print(f"tiled ratio {ratio:.4f}; enc {NB/t_enc/1e9:.3f} dec {NB/t_dec/1e9:.3f} GB/s")
