"""Decode-kernel design variants, timed on the real chip.

V1: production quarter-split kernel (baseline; rows=32).
V2: full-row materialization — one-hot over cluster only (chain:
    cl -> matmul overlaps refill; no coarse gathers, 256-wide ge).
V3: stripped floor — state update + refill only, sym = slot & 255
    (wrong output; measures the irreducible serial skeleton).
"""
import functools
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
from honours_tpu.engine.rans_o1_pallas import (
    WW, _gather_chunks, _taa, rans_o1_decode_pallas,
)
from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L, K_SHARED
from honours_tpu.io.blow5 import read_signals
from honours_tpu.tables.o1 import canned_o1_freqs

B, L = 256, 1 << 16
EMAX = L // 16
K = K_SHARED
ROWS = 64

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

# ---- V1 baseline ----
f1 = jax.jit(lambda bb, ss, dd, sb: rans_o1_decode_pallas(
    bb, ss, dd, sb, tabs["cmap_pad"], tabs["planes_full"],
    Smax, K, rows=ROWS))
ref, _ = timed("V1 quarter rows=32", lambda: f1(body, states, dlen, S_b))
ref = np.asarray(ref)


# ---- full-row tables ----
ft = np.asarray(canned_o1_freqs(), np.int64)
urows = np.unique(ft, axis=0)
r = urows.shape[0]
ucum = np.cumsum(urows, axis=1)
v = ucum - 1
planes_full = np.zeros((r, 512), np.int64)
planes_full[:, :256] = v >> 6
planes_full[:, 256:] = v & 63
planes_full_j = jnp.asarray(planes_full, jnp.bfloat16)


def _vkernel(bodyw_ref, states_ref, dlen_ref, sb_ref, cmap_ref, planes_ref,
             out_ref, ptr_ref, *, nsteps, Kc, rr, variant):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc), 1)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 1)
    ).astype(jnp.float32)
    rdim = planes_ref.shape[0]
    ir = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, rdim), 2)
    cm = cmap_ref[:, :]
    dlen = dlen_ref[:, 0:1]
    sb = sb_ref[:, 0:1]
    kz = jnp.zeros((rr, 128 - Kc), jnp.int32)

    def pad_k(a):
        return jnp.concatenate([a, kz], axis=1)

    for q in range(rr):
        ptr_ref[q] = 0

    def step(t, states, cl, win, rel):
        active = (t < sb) & ((lanes * sb + t) < dlen)
        x = states
        slot = x & (M - 1)
        if variant == "full":
            oh = (cl[:, :, None] == ir).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                oh, planes_ref[:, :],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [rr, K, 512]
            cumhi1 = rows[:, :, :256] * 64.0 + rows[:, :, 256:]
            slot_f = slot.astype(jnp.float32)
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            sym = jnp.sum(ge, axis=-1).astype(jnp.int32)
            c = jnp.max(ge * (cumhi1 + 1.0), axis=-1).astype(jnp.int32)
            chi = jnp.min(
                jnp.where(ge > 0.5, 4096.0, cumhi1 + 1.0), axis=-1
            ).astype(jnp.int32)
            f = chi - c
        else:  # stripped floor
            sym = slot & 255
            f = 16
            c = 0
        newx = f * (x >> PROB_BITS) + slot - c
        x = jnp.where(active, newx, x)
        if variant == "full":
            cl = jnp.where(active, _gather_chunks(cm, pad_k(sym), 2)[:, :Kc], cl)

        need1 = active & (x < RANS_L)
        need2 = active & (x < (RANS_L >> 8))
        f1_ = need1.astype(jnp.float32)
        f2_ = need2.astype(jnp.float32)
        rank1 = jax.lax.dot_general(
            f1_, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        rank2 = jax.lax.dot_general(
            f2_, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt1 = jnp.sum(need1.astype(jnp.int32), axis=1, keepdims=True)
        cnt2 = jnp.sum(need2.astype(jnp.int32), axis=1, keepdims=True)
        idx_a = rel + rank1
        idx_b = rel + cnt1 + rank2
        bidx = jnp.concatenate([idx_a, idx_b, kz[:, : 128 - 2 * Kc]], axis=1)
        bidx = jnp.clip(bidx, 0, 4 * WW - 1)
        widx = bidx >> 2
        wlo = widx & 127
        w = jnp.where(
            widx < 128, _taa(win[:, :128], wlo), _taa(win[:, 128:], wlo)
        )
        byts = (w >> ((bidx & 3) * 8)) & 0xFF
        b_a = byts[:, :Kc]
        b_b = byts[:, Kc:2 * Kc]
        x = jnp.where(need1, (x << 8) | b_a, x)
        x = jnp.where(need2, (x << 8) | b_b, x)
        rel = rel + cnt1 + cnt2
        return x, cl, sym, rel

    rowid_w = jax.lax.broadcasted_iota(jnp.int32, (rr, WW), 0)
    rid1 = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0)

    def reload(win, rel):
        new_rel = jnp.zeros((rr, 1), jnp.int32)
        for q in range(rr):
            p = ptr_ref[q] + jnp.sum(rel[q:q + 1, 0:1])
            base = pl.multiple_of((p >> 9) << 9, 512)
            ptr_ref[q] = base
            loaded = bodyw_ref[
                q:q + 1, pl.ds(pl.multiple_of((base >> 9) * 128, 128), WW)
            ]
            win = jnp.where(rowid_w == q, loaded, win)
            new_rel = jnp.where(rid1 == q, p - base, new_rel)
        return win, new_rel

    def supergroup(sg, carry):
        states, cl, rel = carry
        win = jnp.zeros((rr, WW), jnp.int32)
        syms = []
        for gg in range(4):
            if gg % 2 == 0:
                win, rel = reload(win, rel)
            for j in range(4):
                states, cl, sym, rel = step(
                    (sg * 4 + gg) * 4 + j, states, cl, win, rel)
                syms.append(sym)
        out_ref[:, pl.ds(pl.multiple_of(sg * 16 * Kc, 16 * Kc), 16 * Kc)] = (
            jnp.concatenate(syms, axis=1))
        return states, cl, rel

    states0 = states_ref[:, :]
    cl0 = _gather_chunks(cm, jnp.full((rr, 128), 256, jnp.int32), 3)[:, :Kc]
    rel = jnp.zeros((rr, 1), jnp.int32)
    jax.lax.fori_loop(0, nsteps // 16, supergroup, (states0, cl0, rel))


@functools.partial(jax.jit, static_argnames=("variant",))
def run_variant(body, states, dlen, S_b, variant):
    Bq, Mbq = body.shape
    nsteps16 = -(-Smax // 16) * 16
    Mp = ((Mbq + 511) // 512) * 512 + 4 * WW * 2
    pb = jnp.pad(body, ((0, 0), (0, Mp - Mbq))).reshape(Bq, Mp // 4, 4)
    bodyw = (pb[:, :, 0].astype(jnp.int32)
             | (pb[:, :, 1].astype(jnp.int32) << 8)
             | (pb[:, :, 2].astype(jnp.int32) << 16)
             | (pb[:, :, 3].astype(jnp.int32) << 24))
    Wout = nsteps16 * K
    return pl.pallas_call(
        functools.partial(_vkernel, nsteps=nsteps16, Kc=K, rr=ROWS,
                          variant=variant),
        out_shape=jax.ShapeDtypeStruct((Bq, Wout), jnp.int32),
        grid=(Bq // ROWS,),
        in_specs=[
            pl.BlockSpec((ROWS, Mp // 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ROWS, Wout), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((ROWS,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 << 20,
                2 * ROWS * (Mp + 4 * Wout) + (4 << 20)))),
    )(bodyw, states, dlen.astype(jnp.int32)[:, None],
      S_b.astype(jnp.int32)[:, None], tabs["cmap_pad"], planes_full_j)


out2, _ = timed("V2 fullrow rows=32",
                lambda: run_variant(body, states, dlen, S_b, "full"))
print("  V2 match:", np.array_equal(ref, np.asarray(out2)), flush=True)
_, _ = timed("V3 stripped floor",
             lambda: run_variant(body, states, dlen, S_b, "strip"))
