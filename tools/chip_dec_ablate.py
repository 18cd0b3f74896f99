#!/usr/bin/env python3
"""Ablation timing of the o1 decode kernel's per-step components.

Each variant stubs out one piece of the step (outputs become garbage —
timing only) to locate the cost. Run on the real chip."""

import functools
import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L

R = 8
WW = 256

ABLATE = set(os.environ.get("ABLATE", "").split(","))
ROWS = int(os.environ.get("ROWS", "64"))


def _taa(src_vreg, idx):
    return jnp.take_along_axis(src_vreg, jnp.clip(idx, 0, 127), axis=1)


def _gather_chunks(table_2d, idx, n_chunks: int):
    hi = idx >> 7
    lo = idx & 127
    out = jnp.zeros(idx.shape, jnp.int32)
    for j in range(n_chunks):
        chunk = jnp.broadcast_to(table_2d[j : j + 1, :], idx.shape)
        out = jnp.where(hi == j, _taa(chunk, lo), out)
    return out


def _decode_kernel(bodyw_ref, states_ref, dlen_ref, sb_ref, se_ref, t0_ref,
                   cl0_ref, off_ref, cmap_ref, planes_ref,
                   out_ref, fst_ref, fptr_ref, ptr_ref, win_ref,
                   *, nsteps: int, K: int, r4: int, rr: int, ablate):
    Kc = K
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc), 1)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 1)
    ).astype(jnp.float32)
    irf = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, r4), 2)
    cm = cmap_ref[:, :]
    dlen = dlen_ref[:, 0:1]
    sb = sb_ref[:, 0:1]
    se = se_ref[:, 0:1]
    t0 = t0_ref[:, 0:1]
    kz = jnp.zeros((rr, 128 - Kc), jnp.int32)

    def pad_k(a):
        return jnp.concatenate([a, kz], axis=1)

    for q in range(rr):
        ptr_ref[q] = 0

    def step(t, states, cl, win, rel):
        u = t0 + t
        active = (u < se) & ((lanes * sb + u) < dlen)
        x = states
        slot = x & (M - 1)
        if "dot" in ablate:
            cumhi1 = jnp.broadcast_to(
                (slot[:, :, None] * 0 + 32).astype(jnp.float32), (rr, Kc, 256)
            )
        else:
            oh2 = (cl[:, :, None] == irf).astype(jnp.bfloat16).reshape(
                rr * Kc, r4
            )
            rows = jnp.dot(
                oh2, planes_ref[:, :], preferred_element_type=jnp.float32
            ).reshape(rr, Kc, 512)
            cumhi1 = rows[:, :, :256] * 64.0 + rows[:, :, 256:]
        slot_f = slot.astype(jnp.float32)
        if "search" in ablate:
            sym = slot & 255
            c = slot & 1023
            f = jnp.full_like(slot, 33)
        else:
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            sym3 = jnp.sum(ge, axis=-1)
            sym = sym3.astype(jnp.int32)
            if "cf" in ablate:
                c = slot & 1023
                f = jnp.full_like(slot, 33)
            else:
                i256 = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, 256), 2)
                oh1 = (i256 == (sym - 1)[:, :, None]).astype(jnp.float32)
                ohs = (i256 == sym[:, :, None]).astype(jnp.float32)
                r1 = jnp.sum(oh1 * cumhi1, axis=-1)
                r2 = jnp.sum(ohs * cumhi1, axis=-1)
                c = r1.astype(jnp.int32) + (sym > 0).astype(jnp.int32)
                f = (r2.astype(jnp.int32) + 1) - c
        newx = f * (x >> PROB_BITS) + slot - c
        x = jnp.where(active, newx, x)
        if "clgather" in ablate:
            cl = (sym & 63) * 0 + cl
        else:
            cl = jnp.where(
                active, _gather_chunks(cm, pad_k(sym), 2)[:, :Kc], cl
            )

        if "refill" in ablate:
            x = jnp.where(active & (x < RANS_L), (x << 8) | 1, x)
            return x, cl, sym, rel
        need1 = active & (x < RANS_L)
        need2 = active & (x < (RANS_L >> 8))
        f1 = need1.astype(jnp.float32)
        f2 = need2.astype(jnp.float32)
        rank1 = jax.lax.dot_general(
            f1, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        rank2 = jax.lax.dot_general(
            f2, tri, dimension_numbers=(((1,), (0,)), ((), ())),
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
        b_b = byts[:, Kc : 2 * Kc]
        x = jnp.where(need1, (x << 8) | b_a, x)
        x = jnp.where(need2, (x << 8) | b_b, x)
        rel = rel + cnt1 + cnt2
        return x, cl, sym, rel

    rid1 = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0)
    nwords = bodyw_ref.shape[1]
    base_max = ((nwords - WW) // 128) << 9

    def reload(rel):
        new_rel = jnp.zeros((rr, 1), jnp.int32)
        for q in range(rr):
            p = ptr_ref[q] + jnp.sum(rel[q : q + 1, 0:1])
            base = pl.multiple_of(jnp.minimum((p >> 9) << 9, base_max), 512)
            ptr_ref[q] = base
            win_ref[q : q + 1, :] = bodyw_ref[
                q : q + 1, pl.ds(pl.multiple_of((base >> 9) * 128, 128), WW)
            ]
            new_rel = jnp.where(rid1 == q, p - base, new_rel)
        return new_rel

    def supergroup(sg, carry):
        states, cl, rel = carry
        syms = []
        for gg in range(4):
            if gg % 2 == 0 and "reload" not in ablate:
                rel = reload(rel)
            win = win_ref[:, :]
            for j in range(4):
                states, cl, sym, rel = step(
                    (sg * 4 + gg) * 4 + j, states, cl, win, rel
                )
                syms.append(sym)
        out_ref[:, pl.ds(pl.multiple_of(sg * 16 * Kc, 16 * Kc), 16 * Kc)] = (
            jnp.concatenate(syms, axis=1).astype(jnp.uint8)
        )
        return states, cl, rel

    states = states_ref[:, :]
    cl0 = cl0_ref[:, :]
    rel = off_ref[:, 0:1]
    states, _cl, rel = jax.lax.fori_loop(
        0, nsteps // 16, supergroup, (states, cl0, rel)
    )
    fst_ref[:, :] = states
    for q in range(rr):
        fptr_ref[q : q + 1, :] = rel[q : q + 1, :] + ptr_ref[q]


def launch(body, states, dlen, S_b, cmap_pad, planes4, Smax=0, K=32,
           rows=64, ablate=frozenset()):
    B, Mb = body.shape
    nsteps16 = -(-Smax // 16) * 16
    r4 = planes4.shape[0]
    body_off = jnp.zeros((B,), jnp.int32)
    step_lo = jnp.zeros((B,), jnp.int32)
    step_hi = S_b
    init_cl = jnp.broadcast_to(cmap_pad[2:3, 0:1], (B, K))
    Mp = ((Mb + 511) // 512) * 512 + 4 * WW * 2
    pb = jnp.pad(body, ((0, 0), (0, Mp - Mb))).reshape(B, Mp // 4, 4)
    bodyw = (
        pb[:, :, 0].astype(jnp.int32)
        | (pb[:, :, 1].astype(jnp.int32) << 8)
        | (pb[:, :, 2].astype(jnp.int32) << 16)
        | (pb[:, :, 3].astype(jnp.int32) << 24)
    )
    Wout = nsteps16 * K
    out, fst, fptr = pl.pallas_call(
        functools.partial(
            _decode_kernel, nsteps=nsteps16, K=K, r4=r4, rr=rows,
            ablate=ablate,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Wout), jnp.uint8),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, Mp // 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, Wout), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((rows,), jnp.int32),
            pltpu.VMEM((rows, WW), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(110 << 20, max(16 << 20, 3 * rows * (Mp + Wout) + (16 << 20)))
            )
        ),
    )(
        bodyw, states.astype(jnp.int32), dlen.astype(jnp.int32)[:, None],
        S_b.astype(jnp.int32)[:, None], step_hi.astype(jnp.int32)[:, None],
        step_lo.astype(jnp.int32)[:, None], init_cl.astype(jnp.int32),
        body_off.astype(jnp.int32)[:, None], cmap_pad, planes4,
    )
    return out


def main():
    B, L, K = 256, 1 << 16, 32
    Smax = -(-L // K)
    rng = np.random.default_rng(0)
    Mb = 46080
    body = jnp.asarray(rng.integers(0, 256, (B, Mb), dtype=np.uint8))
    states = jnp.asarray(
        rng.integers(RANS_L, RANS_L * 200, (B, K), dtype=np.int64)
    ).astype(jnp.int32)
    dlen = jnp.full((B,), L, jnp.int32)
    S_b = jnp.full((B,), Smax, jnp.int32)
    from honours_tpu.engine.pipeline import canned_o1_device_tables

    tabs = canned_o1_device_tables()

    def sync(x):
        float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))

    variants = [
        ("full", set()),
        ("no-cf", {"cf"}),
        ("no-search", {"search"}),
        ("no-dot", {"dot", "search"}),
        ("no-clgather", {"clgather"}),
        ("no-refill", {"refill", "reload"}),
        ("skeleton", {"dot", "search", "cf", "clgather", "refill", "reload"}),
    ]
    only = os.environ.get("ONLY")
    for name, ab in variants:
        if only and name not in only.split(","):
            continue
        fn = jax.jit(
            functools.partial(
                launch, Smax=Smax, K=K, rows=ROWS, ablate=frozenset(ab)
            )
        )
        t0 = time.time()
        g = fn(body, states, dlen, S_b, tabs["cmap_pad"], tabs["planes_full"])
        sync(g)
        tc = time.time() - t0
        t0 = time.time()
        reps = 5
        for _ in range(reps):
            g = fn(body, states, dlen, S_b, tabs["cmap_pad"],
                   tabs["planes_full"])
        sync(g)
        t = (time.time() - t0) / reps
        print(f"{name:12s}: {t*1e3:7.1f} ms   (compile {tc:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
