#!/usr/bin/env python3
"""On-chip profile of the srans2 decode path: full pipeline vs the
rANS o1 Pallas kernel alone, across rows settings.  Round-5 work on
VERDICT item 1 (decode >= 1.0 GB/s)."""

import os
import sys
import time

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.pipeline import (
    canned_o1_device_tables,
    depress_srans2_batch,
    press_srans2_batch,
)

B = 256
L = 1 << 16
EMAX = L // 16
REPS = int(os.environ.get("REPS", "6"))


def build_batch():
    from honours_tpu.io.blow5 import read_signals

    reads = read_signals("tests/data/three-reads.blow5")
    chunks = []
    for s in reads:
        for i in range(0, s.size - L + 1, L):
            chunks.append(s[i : i + L])
    while len(chunks) < B:
        chunks = chunks + chunks
    return np.stack(chunks[:B])


def sync(x):
    float(jnp.sum(jnp.ravel(jax.tree.leaves(x)[0])[:1].astype(jnp.float32)))


def timed(fn, reps=REPS):
    r = fn()
    sync(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    sync(r)
    return (time.time() - t0) / reps


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    base = build_batch()
    sig = jnp.asarray(base)
    n = jnp.full((B,), L, jnp.int32)
    nbytes = base.size * 2
    tabs = canned_o1_device_tables()
    s, sl = press_srans2_batch(sig, n, tabs, EMAX)
    Mb = s.shape[1]
    print(f"stream width {Mb}, mean len {float(jnp.mean(sl)):.0f}")

    # full pipeline at default rows
    d = depress_srans2_batch(s, n, tabs, L, emax=EMAX)
    assert bool(jnp.all(d == sig)), "lossless fail"
    t_full = timed(lambda: depress_srans2_batch(s, n, tabs, L, emax=EMAX))
    print(f"full decode: {t_full*1e3:.1f} ms -> {nbytes/t_full/1e9:.3f} GB/s")

    # rANS kernel alone: replicate what rans_o1_decode_batch does
    from honours_tpu.engine.entropy_o1 import rans_o1_decode_batch
    from honours_tpu.engine.rans_o1_pallas import (
        pick_dec_rows,
        rans_o1_decode_pallas,
    )
    from honours_tpu.engine.vbbe21 import vbbe21_parse_batch
    from honours_tpu.engine.bits import read_u32le

    K = 32
    Smax = -(-L // K)

    @jax.jit
    def parse(stream):
        parsed = vbbe21_parse_batch(
            stream, jnp.full((B,), 2, jnp.int32), n - 1, L, EMAX
        )
        base_off = parsed["end_off"]
        dlen = n - 1 - parsed["nex"]
        S_b = read_u32le(stream, base_off).astype(jnp.int32)
        return parsed, base_off, dlen, S_b

    parsed, base_off, dlen, S_b = parse(s)
    t_parse = timed(lambda: parse(s))
    print(f"vbbe21 parse: {t_parse*1e3:.1f} ms")

    from honours_tpu.engine.drans import _rd_states

    states = _rd_states(s, base_off, K).astype(jnp.int32)
    sync(states)
    dflt = pick_dec_rows(B, L, Mb)
    print(f"pick_dec_rows -> {dflt}")
    for rows in (16, 32, 64):
        if B % rows:
            continue
        try:
            t0 = time.time()
            g = rans_o1_decode_pallas(
                s, states, dlen, S_b, tabs["cmap_pad"], tabs["planes_full"],
                Smax, K, rows=rows, body_off=base_off + 4 + 4 * K,
            )
            sync(g)
            tc = time.time() - t0
            t = timed(lambda: rans_o1_decode_pallas(
                s, states, dlen, S_b, tabs["cmap_pad"], tabs["planes_full"],
                Smax, K, rows=rows, body_off=base_off + 4 + 4 * K,
            ))
            print(f"rows={rows}: kernel {t*1e3:.1f} ms "
                  f"({nbytes/t/1e9:.3f} GB/s raw basis, compile {tc:.0f}s)")
        except Exception as e:
            print(f"rows={rows}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
