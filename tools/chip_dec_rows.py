"""Decode-kernel R-scaling + gather-cost experiments on the real chip."""
import sys
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from honours_tpu.engine.pipeline import canned_o1_device_tables, press_srans2_batch
from honours_tpu.engine.vbbe21 import vbbe21_parse_batch
from honours_tpu.engine.bits import read_u32le
from honours_tpu.engine.permute import rowwise_shift_left
from honours_tpu.engine.rans_o1_pallas import rans_o1_decode_pallas
from honours_tpu.kernels.rans import K_SHARED
from honours_tpu.io.blow5 import read_signals

B, L = 256, 1 << 16
EMAX = L // 16
K = K_SHARED
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
tabs = canned_o1_device_tables()

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
    print(f"{name:30s} {dt*1e3:8.2f} ms  {NB/dt/1e9:6.2f} GB/s", flush=True)
    return r, dt


# build decode inputs once
stream, slen = press_srans2_batch(sig, n, tabs, EMAX)
parsed = jax.jit(lambda st: vbbe21_parse_batch(
    st, jnp.full((B,), 2, jnp.int32), n - 1, L, EMAX))(stream)
base_off = parsed["end_off"]
dlen = n - 1 - parsed["nex"]
Mb = stream.shape[1]
S_b = read_u32le(stream, base_off).astype(jnp.int32)
lanes = jnp.arange(K, dtype=jnp.int32)[None, :]


def rd_states(st, bo):
    def b(i, off):
        return jnp.take_along_axis(st, jnp.clip(off + i, 0, Mb - 1), axis=1).astype(jnp.uint32)
    so = bo[:, None] + 4 + 4 * jnp.broadcast_to(lanes, (B, K))
    return (b(0, so) | (b(1, so) << 8) | (b(2, so) << 16) | (b(3, so) << 24)).astype(jnp.int32)


states = jax.jit(rd_states)(stream, base_off)
cap = min(Mb, 2 * L + 256)
body = jax.jit(lambda st, bo: rowwise_shift_left(st, bo + 4 + 4 * K, Mb))(
    stream, base_off)[:, :cap]
Smax = -(-L // K)

# host-correct reference output for checking
ref = None
for rows in (8, 16, 32):
    f = jax.jit(lambda bb, ss, dd, sb, rows=rows: rans_o1_decode_pallas(
        bb, ss, dd, sb, tabs["cmap_pad"], tabs["planes_full"],
        Smax, K, rows=rows))
    out, dt = timed(f"decode kernel rows={rows}", lambda: f(body, states, dlen, S_b))
    if ref is None:
        ref = np.asarray(out)
    else:
        print("  match rows=8:", np.array_equal(ref, np.asarray(out)), flush=True)


# gather chain cost: g gathers per loop iteration
def chain_kernel(g):
    def k(x_ref, i_ref, o_ref):
        def body(t, acc):
            v = acc
            for _ in range(g):
                v = jnp.take_along_axis(x_ref[:, :], jnp.clip(v, 0, 127), axis=1)
            return v + (i_ref[:, :] & 1)
        o_ref[:, :] = jax.lax.fori_loop(0, 4096, body, i_ref[:, :])
    xq = jnp.asarray(np.random.randint(0, 128, (8, 128)), jnp.int32)
    iq = jnp.asarray(np.random.randint(0, 128, (8, 128)), jnp.int32)
    return jax.jit(lambda a, b: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)), xq, iq


for g in (1, 8):
    f, xq, iq = chain_kernel(g)
    r = f(xq, iq); float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(5):
        r = f(xq, iq)
    float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    dt = (time.time() - t0 - RTT) / 5
    print(f"chained gathers x{g}: {dt*1e9/4096:.1f} ns/iter "
          f"({dt*1e9/4096*0.94/max(g,1):.1f} cyc/gather-ish)", flush=True)
