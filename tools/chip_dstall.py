"""Stage profile of press_dstall_batch on the real chip (VERDICT r4
item 6: encode was 0.147 GB/s vs a 3-encode ceiling of srans2_enc/3).

Times: srans2 encode alone, the batched segmentation, the branch signal
extractions, the three-encode total, and the assembly — to show which
part of the gap between dstall_enc and srans2_enc/3 is real work vs
overhead."""

import sys
import time

import numpy as np
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, ".")
from honours_tpu.engine.pipeline import (
    canned_o1_device_tables, press_srans2_batch, depress_srans2_batch,
)
from honours_tpu.engine.dstall import (
    _split_batch, press_dstall_batch, depress_dstall_batch,
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
    print(f"{name:36s} {dt*1e3:8.2f} ms  {NB/dt/1e9:7.2f} GB/s-equiv")
    return r, dt


(st1, sl1), t1 = timed("press_srans2_batch x1", lambda: press_srans2_batch(sig, n, tabs, EMAX))
seg_f = jax.jit(_split_batch)
_, t_seg = timed("  segmentation (_split_batch)", lambda: seg_f(sig, n))
(std, sld), td = timed("press_dstall_batch (e2e)", lambda: press_dstall_batch(sig, n, tabs, EMAX))
print(f"gap vs 3x srans2: {td*1e3 - 3*t1*1e3:.1f} ms", file=sys.stderr)
_, tdd = timed("depress_dstall_batch (e2e)", lambda: depress_dstall_batch(std, n, tabs, L, emax=EMAX))
d = depress_dstall_batch(std, n, tabs, L, emax=EMAX)
print("dstall lossless:", bool(jnp.all(d == sig)))
_, t1d = timed("depress_srans2_batch x1", lambda: depress_srans2_batch(st1, n, tabs, L, emax=EMAX))
