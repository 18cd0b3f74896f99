"""Search-redesign timing probes for the o1 decode kernel.

Variants (timing-focused; decode output correctness not asserted here):
  base     — production search: bf16 6/6 planes [64,512], *64 combine,
             4 reductions over 256
  f32row   — f32 planes [64,256] (cumhi exact in f32), f32 one-hot dot,
             reductions over 256, no combine
  f32sum   — f32row but sym via a SECOND MXU dot (ge @ ones) instead of
             a VPU sum; c/f still VPU max/min
  wide64   — base shapes with 64 lanes/row x half the steps (what a
             K=64 format would cost per step-chain)
  f32wide  — f32row x 64 lanes x half steps
"""
import functools
import sys
import time
import os

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.engine.pipeline import canned_o1_device_tables, press_srans2_batch
from honours_tpu.engine.vbbe21 import vbbe21_parse_batch
from honours_tpu.engine.bits import read_u32le
from honours_tpu.engine.permute import rowwise_shift_left
from honours_tpu.engine.rans_o1_pallas import WW, _gather_chunks, _taa
from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L, K_SHARED
from honours_tpu.io.blow5 import read_signals
from honours_tpu.tables.o1 import canned_o1_freqs

B, L = 256, 1 << 16
EMAX = L // 16
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
print(f"RTT {RTT*1e3:.1f} ms rows={ROWS}", flush=True)


def timed(name, fn, reps=8):
    t0 = time.time()
    r = fn()
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    print(f"  [{name} compile {time.time()-t0:.0f}s]", flush=True)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    dt = max((time.time() - t0 - RTT) / reps, 1e-9)
    print(f"{name:20s} {dt*1e3:8.2f} ms  {NB/dt/1e9:6.2f} GB/s", flush=True)
    return r, dt


stream, slen = press_srans2_batch(sig, n, tabs, EMAX)
parsed = jax.jit(lambda st: vbbe21_parse_batch(
    st, jnp.full((B,), 2, jnp.int32), n - 1, L, EMAX))(stream)
base_off = parsed["end_off"]
dlen = n - 1 - parsed["nex"]
Mb = stream.shape[1]
S_b = read_u32le(stream, base_off).astype(jnp.int32)
K0 = K_SHARED
lanes = jnp.arange(K0, dtype=jnp.int32)[None, :]


def rd_states(st, bo):
    def b(i, off):
        return jnp.take_along_axis(st, jnp.clip(off + i, 0, Mb - 1), axis=1).astype(jnp.uint32)
    so = bo[:, None] + 4 + 4 * jnp.broadcast_to(lanes, (B, K0))
    return (b(0, so) | (b(1, so) << 8) | (b(2, so) << 16) | (b(3, so) << 24)).astype(jnp.int32)


states0 = jax.jit(rd_states)(stream, base_off)
cap = min(Mb, 2 * L + 256)
body = jax.jit(lambda st, bo: rowwise_shift_left(st, bo + 4 + 4 * K0, Mb))(
    stream, base_off)[:, :cap]

ft = np.asarray(canned_o1_freqs(), np.int64)
urows = np.unique(ft, axis=0)
r4 = urows.shape[0]
ucum = np.cumsum(urows, axis=1)
v = ucum - 1
pf = np.zeros((r4, 512), np.int64)
pf[:, :256] = v >> 6
pf[:, 256:] = v & 63
planes_bf = jnp.asarray(pf, jnp.bfloat16)
planes_f32 = jnp.asarray(v, jnp.float32)  # [r4, 256] cumhi-1 exact
planes_i8 = jnp.asarray(pf, jnp.int8)  # 6-bit planes fit int8


def _vkernel(bodyw_ref, states_ref, dlen_ref, sb_ref, cmap_ref, planes_ref,
             out_ref, ptr_ref, win_ref, *, nsteps, Kc, rr, variant):
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc), 1)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 1)
    ).astype(jnp.float32)
    irf = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, r4), 2)
    cm = cmap_ref[:, :]
    dlen = dlen_ref[:, 0:1]
    sb = sb_ref[:, 0:1]
    PADK = 128 * ((Kc + 127) // 128)
    kz = jnp.zeros((rr, PADK - Kc), jnp.int32)

    def pad_k(a):
        return jnp.concatenate([a, kz], axis=1) if PADK > Kc else a

    for q in range(rr):
        ptr_ref[q] = 0

    ones_c = jnp.ones((256, 128), jnp.float32)

    def step(t, states, cl, win, rel):
        active = (t < sb) & ((lanes * sb + t) < dlen)
        x = states
        slot = x & (M - 1)
        if variant == "dotonly":
            oh2 = (cl[:, :, None] == irf).astype(jnp.bfloat16).reshape(
                rr * Kc, r4)
            rows = jnp.dot(oh2, planes_ref[:, :],
                           preferred_element_type=jnp.float32).reshape(
                rr, Kc, 512)
            sym = rows[:, :, 0].astype(jnp.int32) & 255
            f = 16
            c = 0
        elif variant == "redonly":
            rows = (slot[:, :, None].astype(jnp.float32)
                    + jax.lax.broadcasted_iota(
                        jnp.int32, (rr, Kc, 512), 2).astype(jnp.float32))
            cumhi1 = rows[:, :, :256] * 64.0 + rows[:, :, 256:]
            slot_f = slot.astype(jnp.float32)
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            sym = jnp.sum(ge, axis=-1).astype(jnp.int32) & 255
            c = jnp.max(ge * (cumhi1 + 1.0), axis=-1).astype(jnp.int32) & 0
            chi = jnp.min(
                jnp.where(ge > 0.5, 4096.0, cumhi1 + 1.0), axis=-1
            ).astype(jnp.int32)
            f = (chi & 0) + 16
        elif variant == "symonly":
            oh2 = (cl[:, :, None] == irf).astype(jnp.bfloat16).reshape(
                rr * Kc, r4)
            rows = jnp.dot(oh2, planes_ref[:, :],
                           preferred_element_type=jnp.float32).reshape(
                rr, Kc, 512)
            cumhi1 = rows[:, :, :256] * 64.0 + rows[:, :, 256:]
            slot_f = slot.astype(jnp.float32)
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            sym = jnp.sum(ge, axis=-1).astype(jnp.int32)
            f = 16
            c = 0
        elif variant == "bf16all":
            # bf16 dot output (6-bit planes exact), hi/lo plane compare
            # without the *64 combine, sym summed in bf16 (exact to 256)
            oh2 = (cl[:, :, None] == irf).astype(jnp.bfloat16).reshape(
                rr * Kc, r4)
            rows = jnp.dot(oh2, planes_ref[:, :],
                           preferred_element_type=jnp.bfloat16).reshape(
                rr, Kc, 512)
            ph = rows[:, :, :256]
            plo = rows[:, :, 256:]
            sh = (slot >> 6).astype(jnp.bfloat16)[:, :, None]
            sl = (slot & 63).astype(jnp.bfloat16)[:, :, None]
            gt = (ph < sh) | ((ph == sh) & (plo < sl))
            geb = gt.astype(jnp.bfloat16)
            sym = jnp.sum(geb, axis=-1).astype(jnp.int32)
            # single-position masks: diff selects sym-1, ohs selects sym
            cols512 = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, 256), 2)
            diff = geb - jnp.where(cols512 < 255, 0.0, 0.0)  # placeholder
            c_hi = jnp.max(geb * ph, axis=-1)  # timing-shape proxy
            c_lo = jnp.max(geb * plo, axis=-1)
            c = (c_hi.astype(jnp.int32) << 6) | c_lo.astype(jnp.int32)
            f = jnp.maximum(
                (jnp.min(jnp.where(gt, jnp.bfloat16(64), ph), axis=-1)
                 .astype(jnp.int32) << 6), 1) - c
            f = jnp.maximum(f, 1)
        elif variant.startswith("i8"):
            rr4 = planes_ref.shape[0]
            irf8 = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, rr4), 2)
            clm = cl if rr4 >= 64 else (cl % rr4)
            oh8 = (clm[:, :, None] == irf8).astype(jnp.int8).reshape(
                rr * Kc, rr4)
            rows = jax.lax.dot_general(
                oh8, planes_ref[:, :].astype(jnp.int8),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).reshape(rr, Kc, 512)
            cumhi1i = rows[:, :, :256] * 64 + rows[:, :, 256:]
            ge_i = (slot[:, :, None] > cumhi1i)
            sym = jnp.sum(ge_i.astype(jnp.int32), axis=-1)
            c = jnp.max(jnp.where(ge_i, cumhi1i + 1, 0), axis=-1)
            chi = jnp.min(jnp.where(ge_i, 4096, cumhi1i + 1), axis=-1)
            f = chi - c
        elif variant.startswith("c16"):
            rr4 = 16
            irf16 = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, rr4), 2)
            oh16 = ((cl % rr4)[:, :, None] == irf16).astype(
                jnp.bfloat16).reshape(rr * Kc, rr4)
            rows = jnp.dot(oh16, planes_ref[:16, :],
                           preferred_element_type=jnp.float32).reshape(
                rr, Kc, 512)
            cumhi1 = rows[:, :, :256] * 64.0 + rows[:, :, 256:]
            slot_f = slot.astype(jnp.float32)
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            sym = jnp.sum(ge, axis=-1).astype(jnp.int32)
            c = jnp.max(ge * (cumhi1 + 1.0), axis=-1).astype(jnp.int32)
            chi = jnp.min(
                jnp.where(ge > 0.5, 4096.0, cumhi1 + 1.0), axis=-1
            ).astype(jnp.int32)
            f = chi - c
        elif variant.startswith("f32"):
            oh = (cl[:, :, None] == irf).astype(jnp.float32).reshape(
                rr * Kc, r4)
            cumhi1 = jnp.dot(oh, planes_ref[:, :],
                             preferred_element_type=jnp.float32).reshape(
                rr, Kc, 256)
            slot_f = slot.astype(jnp.float32)
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            if variant == "f32sum":
                sym = jax.lax.dot_general(
                    ge.reshape(rr * Kc, 256), ones_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )[:, 0].reshape(rr, Kc).astype(jnp.int32)
            else:
                sym = jnp.sum(ge, axis=-1).astype(jnp.int32)
            c = jnp.max(ge * (cumhi1 + 1.0), axis=-1).astype(jnp.int32)
            chi = jnp.min(
                jnp.where(ge > 0.5, 4096.0, cumhi1 + 1.0), axis=-1
            ).astype(jnp.int32)
            f = chi - c
        else:
            oh2 = (cl[:, :, None] == irf).astype(jnp.bfloat16).reshape(
                rr * Kc, r4)
            rows = jnp.dot(oh2, planes_ref[:, :],
                           preferred_element_type=jnp.float32).reshape(
                rr, Kc, 512)
            cumhi1 = rows[:, :, :256] * 64.0 + rows[:, :, 256:]
            slot_f = slot.astype(jnp.float32)
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            sym = jnp.sum(ge, axis=-1).astype(jnp.int32)
            c = jnp.max(ge * (cumhi1 + 1.0), axis=-1).astype(jnp.int32)
            chi = jnp.min(
                jnp.where(ge > 0.5, 4096.0, cumhi1 + 1.0), axis=-1
            ).astype(jnp.int32)
            f = chi - c
        newx = f * (x >> PROB_BITS) + slot - c
        x = jnp.where(active, newx, x)
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
        if 2 * Kc < 128:
            bidx = jnp.concatenate([idx_a, idx_b, kz[:, :128 - 2 * Kc]], axis=1)
        else:
            bidx = jnp.concatenate([idx_a, idx_b], axis=1)
        bidx = jnp.clip(bidx, 0, 4 * WW - 1)
        widx = bidx >> 2
        wlo = widx & 127
        w = jnp.where(
            widx < 128, _taa2(win[:, :128], wlo), _taa2(win[:, 128:], wlo)
        )
        byts = (w >> ((bidx & 3) * 8)) & 0xFF
        b_a = byts[:, :Kc]
        b_b = byts[:, Kc:2 * Kc]
        x = jnp.where(need1, (x << 8) | b_a, x)
        x = jnp.where(need2, (x << 8) | b_b, x)
        rel = rel + cnt1 + cnt2
        return x, cl, sym, rel

    def _taa2(src, idx):
        # like _taa but tolerates >128 columns of idx by chunking
        if idx.shape[1] <= 128:
            return _taa(src, idx)
        outs = []
        for s0 in range(0, idx.shape[1], 128):
            outs.append(_taa(src, idx[:, s0:s0 + 128]))
        return jnp.concatenate(outs, axis=1)

    rid1 = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0)

    def reload(rel):
        new_rel = jnp.zeros((rr, 1), jnp.int32)
        for q in range(rr):
            p = ptr_ref[q] + jnp.sum(rel[q:q + 1, 0:1])
            base = pl.multiple_of((p >> 9) << 9, 512)
            ptr_ref[q] = base
            win_ref[q:q + 1, :] = bodyw_ref[
                q:q + 1, pl.ds(pl.multiple_of((base >> 9) * 128, 128), WW)
            ]
            new_rel = jnp.where(rid1 == q, p - base, new_rel)
        return new_rel

    def supergroup(sg, carry):
        states, cl, rel = carry
        syms = []
        for gg in range(4):
            if gg % 2 == 0:
                rel = reload(rel)
            win = win_ref[:, :]
            for j in range(4):
                states, cl, sym, rel = step(
                    (sg * 4 + gg) * 4 + j, states, cl, win, rel)
                syms.append(sym)
        out_ref[:, pl.ds(pl.multiple_of(sg * 16 * Kc, 16 * Kc), 16 * Kc)] = (
            jnp.concatenate(syms, axis=1).astype(jnp.uint8))
        return states, cl, rel

    states0_ = states_ref[:, :]
    cl0 = _gather_chunks(cm, jnp.full((rr, 128), 256, jnp.int32), 3)[:, :Kc]
    rel = jnp.zeros((rr, 1), jnp.int32)
    jax.lax.fori_loop(0, nsteps // 16, supergroup, (states0_, cl0, rel))


@functools.partial(jax.jit, static_argnames=("variant", "Kc", "rr"))
def run_variant(body, states, dlen, S_b, variant, Kc, rr=ROWS):
    Bq, Mbq = body.shape
    Smax = -(-L // Kc)
    nsteps16 = -(-Smax // 16) * 16
    Mp = ((Mbq + 511) // 512) * 512 + 4 * WW * 2
    pb = jnp.pad(body, ((0, 0), (0, Mp - Mbq))).reshape(Bq, Mp // 4, 4)
    bodyw = (pb[:, :, 0].astype(jnp.int32)
             | (pb[:, :, 1].astype(jnp.int32) << 8)
             | (pb[:, :, 2].astype(jnp.int32) << 16)
             | (pb[:, :, 3].astype(jnp.int32) << 24))
    Wout = nsteps16 * Kc
    planes = planes_f32 if variant.startswith("f32") else (
        planes_i8 if variant.startswith("i8") else planes_bf)
    st = states if Kc == K0 else jnp.concatenate([states] * (Kc // K0), axis=1)
    RR = rr
    return pl.pallas_call(
        functools.partial(_vkernel, nsteps=nsteps16, Kc=Kc, rr=rr,
                          variant=variant),
        out_shape=jax.ShapeDtypeStruct((Bq, Wout), jnp.uint8),
        grid=(Bq // RR,),
        in_specs=[
            pl.BlockSpec((RR, Mp // 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RR, Kc), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RR, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((RR, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((RR, Wout), lambda b: (b, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((RR,), jnp.int32),
                        pltpu.VMEM((RR, WW), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(min(100 << 20,
                2 * RR * (Mp + 4 * Wout) + (4 << 20)))),
    )(bodyw, st, dlen.astype(jnp.int32)[:, None],
      S_b.astype(jnp.int32)[:, None], tabs["cmap_pad"], planes)


for v in ("redonly", "symonly", "bf16all"):
    out, _ = timed(v, lambda v=v: run_variant(
        body, states0, dlen, S_b, v, 32, 64))
