"""Chip timing: fused svb16 kernels vs the round-2 XLA+walk engine."""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from honours_tpu.engine.svb16 import svb16_encode_batch, svb16_decode_batch
from honours_tpu.engine.svb16_fused import svb16_encode_fused, svb16_decode_fused
from honours_tpu.io.blow5 import read_signals

B, L = 256, 1 << 16
reads = read_signals("tests/data/three-reads.blow5")
chunks = []
for s in reads:
    for i in range(0, s.size - L + 1, L):
        chunks.append(s[i:i + L])
while len(chunks) < B:
    chunks = chunks + chunks
sig = jnp.asarray(np.stack(chunks[:B]))
n = jnp.full((B,), L, jnp.int32)
NB = B * L * 2

x0 = jnp.zeros((), jnp.float32) + 1
float(x0)
t0 = time.time()
for _ in range(5):
    float(x0 + 1)
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
    print(f"{name:28s} {dt*1e3:8.2f} ms  {NB/dt/1e9:6.2f} GB/s", flush=True)
    return r, dt


(st_old, len_old), _ = timed("encode XLA+walk", lambda: svb16_encode_batch(sig, n, zd=True))
(st_new, len_new), t_e = timed("encode fused", lambda: svb16_encode_fused(sig, n, zd=True))
ok_len = bool(jnp.all(len_old == len_new))
ok_enc = bool(jnp.all(jnp.where(
    jnp.arange(st_new.shape[1])[None, :] < len_new[:, None],
    st_new.astype(jnp.int32) - st_old[:, :st_new.shape[1]].astype(jnp.int32), 0) == 0))
print("encode parity:", ok_len, ok_enc, flush=True)

dec_old, _ = timed("decode XLA+walk", lambda: svb16_decode_batch(st_old, n, L, zd=True))
dec_new, t_d = timed("decode fused", lambda: svb16_decode_fused(st_new, n, L, zd=True))
print("decode lossless:", bool(jnp.all(dec_new == sig)),
      "old lossless:", bool(jnp.all(dec_old == sig)), flush=True)
print(f"fused enc+dec: {2*NB/(t_e+t_d)/1e9:.2f} GB/s", flush=True)
