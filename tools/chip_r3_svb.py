"""Chip: fused svb16 parity+timing, and o0 srans depress after VMEM fix."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ["HTPU_SVB16_FUSED"] = "0"  # time the old path explicitly first
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

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


from honours_tpu.engine.svb16 import svb16_decode_batch, svb16_encode_batch
from honours_tpu.engine.svb16_fused import svb16_decode_fused, svb16_encode_fused

(st_old, len_old), t_eo = timed(
    "svb16 encode XLA+walk", lambda: svb16_encode_batch(sig, n, zd=True))
try:
    (st_new, len_new), t_en = timed(
        "svb16 encode fused", lambda: svb16_encode_fused(sig, n, zd=True))
    ok_len = bool(jnp.all(len_old == len_new))
    W = st_new.shape[1]
    cols = jnp.arange(W)[None, :]
    ok_enc = bool(jnp.all(jnp.where(
        cols < len_new[:, None],
        st_new.astype(jnp.int32) - st_old[:, :W].astype(jnp.int32), 0) == 0))
    print("fused encode parity:", ok_len, ok_enc, flush=True)
except Exception as e:
    print("fused encode FAILED:", type(e).__name__, str(e)[:400], flush=True)
    st_new, t_en = st_old, 1.0

_, t_do = timed(
    "svb16 decode XLA+walk", lambda: svb16_decode_batch(st_old, n, L, zd=True))
try:
    dec_new, t_dn = timed(
        "svb16 decode fused", lambda: svb16_decode_fused(st_new, n, L, zd=True))
    print("fused decode lossless:", bool(jnp.all(dec_new == sig)), flush=True)
    print(f"fused enc+dec: {2*NB/(t_en+t_dn)/1e9:.2f} GB/s", flush=True)
except Exception as e:
    print("fused decode FAILED:", type(e).__name__, str(e)[:400], flush=True)

# o0 srans depress after the VMEM-budget fix
from honours_tpu.engine.pipeline import (
    canned_rans_tables, depress_srans_batch, press_srans_batch,
)

freqs, cum = canned_rans_tables()
(st0, sl0), _ = timed(
    "srans press e2e", lambda: press_srans_batch(sig, n, freqs, cum, EMAX))
try:
    d0, _ = timed(
        "srans depress e2e",
        lambda: depress_srans_batch(st0, n, freqs, cum, L, emax=EMAX))
    print("srans lossless:", bool(jnp.all(d0 == sig)), flush=True)
except Exception as e:
    print("srans depress FAILED:", type(e).__name__, str(e)[:400], flush=True)

# srans2 e2e with the full-row decode kernel
from honours_tpu.engine.pipeline import (
    canned_o1_device_tables, depress_srans2_batch, press_srans2_batch,
)

tabs = canned_o1_device_tables()
(st2, sl2), t_e2 = timed(
    "srans2 press e2e", lambda: press_srans2_batch(sig, n, tabs, EMAX))
try:
    d2, t_d2 = timed(
        "srans2 depress e2e",
        lambda: depress_srans2_batch(st2, n, tabs, L, emax=EMAX))
    from honours_tpu.codecs.base import get as get_codec
    host = get_codec("srans2_vbbe21_zd").press(base[0])
    par = np.asarray(st2[0, : int(sl2[0])]).tobytes() == host
    print("srans2 lossless:", bool(jnp.all(d2 == sig)), "parity:", par,
          f"enc+dec {2*NB/(t_e2+t_d2)/1e9:.2f} GB/s", flush=True)
except Exception as e:
    print("srans2 depress FAILED:", type(e).__name__, str(e)[:1200], flush=True)
