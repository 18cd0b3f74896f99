"""Capture a jax.profiler device trace of srans2 encode+decode and print
per-op timing aggregates (no tensorboard needed — parses the .xplane.pb)."""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import sys
import time
import glob
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
sys.path.insert(0, ".")
from honours_tpu.engine.pipeline import (
    canned_o1_device_tables, press_srans2_batch, depress_srans2_batch,
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

# warm
stream, slen = press_srans2_batch(sig, n, tabs, EMAX)
dec = depress_srans2_batch(stream, n, tabs, L, emax=EMAX)
float(jnp.sum(slen)); float(jnp.sum(dec[:1, :1].astype(jnp.float32)))
print("warm done", flush=True)

trace_dir = "/tmp/jtrace"
os.system(f"rm -rf {trace_dir}")
with jax.profiler.trace(trace_dir):
    for _ in range(2):
        stream, slen = press_srans2_batch(sig, n, tabs, EMAX)
        dec = depress_srans2_batch(stream, n, tabs, L, emax=EMAX)
    float(jnp.sum(dec[:1, :1].astype(jnp.float32)))
print("trace done", flush=True)

# parse xplane
from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

paths = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
print(paths, flush=True)
agg = {}
for p in paths:
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(p, "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                dur = ev.duration_ps / 1e9  # ms
                agg[name] = agg.get(name, 0.0) + dur
tot = sum(agg.values())
for name, ms in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{ms/2:9.3f} ms  {name[:110]}")
print(f"total {tot/2:.2f} ms per iter (sum over ops; may double-count lines)")
