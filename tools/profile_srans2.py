"""Stage-by-stage wall profile of the srans2 TPU pipeline on the real chip.

Times each pipeline stage separately (jitted in isolation) to find where
encode 0.44 / decode 0.25 GB/s actually goes.
"""
import functools
import time
import sys

import numpy as np
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp

sys.path.insert(0, ".")
from honours_tpu.engine.pipeline import (
    canned_o1_device_tables, press_srans2_batch, depress_srans2_batch,
    _zd_parts,
)
from honours_tpu.engine.vbbe21 import (
    vbbe21_parts_batch, vbbe21_parse_batch, vbbe21_fill_batch,
)
from honours_tpu.engine.entropy_o1 import (
    rans_o1_encode_batch, rans_o1_decode_batch, _lane_grid, _o1_fc, _ungrid,
)
from honours_tpu.engine.bits import rowwise_concat, u16le_bytes, read_u32le
from honours_tpu.engine.permute import (
    monotone_compact, monotone_expand, rowwise_shift_left,
)
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
tabs = canned_o1_device_tables()

# RTT measurement
x = jnp.zeros((), jnp.float32) + 1
float(x)
t0 = time.time()
for _ in range(5):
    float(x + 1)
RTT = (time.time() - t0) / 5
print(f"RTT {RTT*1e3:.1f} ms", file=sys.stderr)

NB = B * L * 2  # raw int16 bytes


def timed(name, fn, reps=4):
    r = fn()
    leaves = jax.tree.leaves(r)
    float(jnp.sum(jnp.ravel(leaves[0])[:1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    leaves = jax.tree.leaves(r)
    float(jnp.sum(jnp.ravel(leaves[0])[:1].astype(jnp.float32)))
    dt = max((time.time() - t0 - RTT) / reps, 1e-9)
    print(f"{name:34s} {dt*1e3:8.2f} ms  {NB/dt/1e9:7.2f} GB/s-equiv")
    return r, dt


# ---------------- end-to-end ----------------
(stream, slen), t_enc = timed("press_srans2_batch (e2e)",
                              lambda: press_srans2_batch(sig, n, tabs, EMAX))
_, t_dec = timed("depress_srans2_batch (e2e)",
                 lambda: depress_srans2_batch(stream, n, tabs, L, emax=EMAX))

# ---------------- encode stages ----------------
zd_f = jax.jit(lambda s, nn: _zd_parts(s, nn))
(zd0, rest), _ = timed("  zd_parts", lambda: zd_f(sig, n))

parts_f = jax.jit(functools.partial(vbbe21_parts_batch, emax=EMAX))
parts, _ = timed("  vbbe21_parts", lambda: parts_f(rest, n - 1))

data, dlen = parts["data"], parts["data_len"]
enc_f = jax.jit(functools.partial(rans_o1_encode_batch))
(body, blen), _ = timed("  rans_o1_encode_batch", lambda: enc_f(data, dlen, tabs))

# encode sub-stages
Smax = -(-data.shape[1] // K)
lane_f = jax.jit(lambda d, dl: _lane_grid(d, dl, K, Smax))
(g3, ctx3, act3, S_b), _ = timed("    lane_grid (monotone_expand)",
                                 lambda: lane_f(data, dlen))

lookup_f = jax.jit(lambda g, c: _o1_fc(g.reshape(B, -1), c.reshape(B, -1), tabs))
(f3_, c3_), _ = timed("    o1_lookup_pallas", lambda: lookup_f(g3, ctx3))

from honours_tpu.engine.rans_encode_pallas import rans_encode_core_pallas
f3 = f3_.reshape(B, K, Smax); c3 = c3_.reshape(B, K, Smax)
fc3 = jnp.where(act3, f3 + c3 * 8192, 0)
fc = jnp.transpose(fc3, (0, 2, 1)).reshape(B, Smax * K)

prep_f = jax.jit(lambda f3a, c3a, a3: jnp.transpose(
    jnp.where(a3, f3a + c3a * 8192, 0), (0, 2, 1)).reshape(B, Smax * K))
_, _ = timed("    fc transpose/pack", lambda: prep_f(f3, c3, act3))

walk_f = jax.jit(lambda fcx: rans_encode_core_pallas(fcx, Smax, K))
(plane, states_i), _ = timed("    encode walk kernel", lambda: walk_f(fc))

comp_f = jax.jit(lambda p: monotone_compact((p & 255).astype(jnp.uint8), (p >> 8) == 1))
_, _ = timed("    monotone_compact(plane)", lambda: comp_f(plane))

# ---------------- decode stages ----------------
parse_f = jax.jit(lambda st, nn: vbbe21_parse_batch(
    st, jnp.full((B,), 2, jnp.int32), nn - 1, L, EMAX))
parsed, _ = timed("  vbbe21_parse", lambda: parse_f(stream, n))

base_off = parsed["end_off"]
dl2 = n - 1 - parsed["nex"]
dec_f = jax.jit(lambda st, bo, dd: rans_o1_decode_batch(st, bo, dd, tabs, L, K))
data_dec, _ = timed("  rans_o1_decode_batch", lambda: dec_f(stream, base_off, dl2))

# decode sub-stages
Mb = stream.shape[1]
shift_f = jax.jit(lambda st, bo: rowwise_shift_left(st, bo + 4 + 4 * K, Mb))
body_dec, _ = timed("    rowwise_shift_left(body)", lambda: shift_f(stream, base_off))

from honours_tpu.engine.rans_o1_pallas import rans_o1_decode_pallas, R
S_b2 = read_u32le(stream, base_off).astype(jnp.int32)
lanes = jnp.arange(K, dtype=jnp.int32)[None, :]


def rd_states(st, bo):
    def b(i, off):
        return jnp.take_along_axis(st, jnp.clip(off + i, 0, Mb - 1), axis=1).astype(jnp.uint32)
    so = bo[:, None] + 4 + 4 * jnp.broadcast_to(lanes, (B, K))
    return (b(0, so) | (b(1, so) << 8) | (b(2, so) << 16) | (b(3, so) << 24))


states_dec = jax.jit(rd_states)(stream, base_off)
SmaxL = -(-L // K)
cap = min(Mb, 2 * L + 256)
bslice = body_dec[:, :cap]
kern_f = jax.jit(lambda bb, ss, dd, sb: rans_o1_decode_pallas(
    bb, ss.astype(jnp.int32), dd, sb, tabs["cmap_pad"],
    tabs["planes_full"], SmaxL, K))
grid_out, _ = timed("    decode kernel (pallas)",
                    lambda: kern_f(bslice, states_dec, dl2, S_b2))

ung_f = jax.jit(lambda g, sb, dd: _ungrid(g, sb, dd, K, SmaxL, L))
_, _ = timed("    ungrid (monotone_compact)", lambda: ung_f(grid_out, S_b2, dl2))

fill_f = jax.jit(lambda p, d: vbbe21_fill_batch(p, d, n - 1, L))
_, _ = timed("  vbbe21_fill+merge", lambda: fill_f(parsed, data_dec))

print("total enc %.2f ms dec %.2f ms" % (t_enc * 1e3, t_dec * 1e3))
