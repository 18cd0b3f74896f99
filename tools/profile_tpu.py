"""Chained (RTT-proof) stage profiler for the TPU engines.

Usage: python tools/profile_tpu.py
Times each jitted stage by running it `reps` times with a serial data
dependency inside one jit and fetching a single scalar; reports
(T(n2)-T(n1))/(n2-n1) so tunnel RTT and dispatch cancel.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

B, L = 64, 1 << 16


def chain(name, fn, args, n1=2, n2=8):
    def make(reps):
        def chained(*args):
            def body(_, carry):
                acc, args = carry
                y = fn(*args)
                s = jnp.sum(jnp.ravel(y)[:4].astype(jnp.float32))
                bump = (s.astype(jnp.int32) & 1).astype(args[0].dtype)
                args = (args[0] + bump,) + args[1:]
                return acc + s, args
            acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0), args))
            return acc
        return jax.jit(chained)

    ts = []
    for reps in (n1, n2):
        f = make(reps)
        float(f(*args))
        best = 1e9
        for _ in range(2):
            t0 = time.time()
            float(f(*args))
            best = min(best, time.time() - t0)
        ts.append(best)
    dt = (ts[1] - ts[0]) / (n2 - n1)
    gbs = 2 * B * L / max(dt, 1e-9) / 1e9
    print(f"{name:44s} {dt * 1e3:9.2f} ms  ({gbs:6.2f} GB/s-equiv)", flush=True)
    return dt


def main():
    from honours_tpu.engine.pipeline import (
        canned_rans_tables,
        depress_srans_batch,
        press_srans_batch,
    )
    from honours_tpu.engine.svb16 import svb16_decode_batch, svb16_encode_batch
    from honours_tpu.engine.vbbe21 import vbbe21_parts_batch, vbbe21_decode_batch
    from honours_tpu.engine.entropy import rans_encode_batch, rans_decode_batch
    from honours_tpu.engine.permute import monotone_compact, rowwise_shift_left
    from honours_tpu.transforms.core import jnp_zigdelta

    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.integers(400, 700, (B, L)).astype(np.int16))
    n = jnp.full((B,), L, jnp.int32)
    freqs, cum = canned_rans_tables()

    chain("zigdelta", lambda s: jnp_zigdelta(s), (sig,))
    chain("svb16_encode", lambda s: svb16_encode_batch(s, n)[0], (sig,))
    stream, _ = svb16_encode_batch(sig, n)
    chain("svb16_decode", lambda st: svb16_decode_batch(st, n, L), (stream,))

    v = jnp_zigdelta(sig)
    chain("vbbe21_parts", lambda vv: vbbe21_parts_batch(vv, n)["data"], (v,))
    parts = jax.jit(lambda vv: vbbe21_parts_batch(vv, n))(v)
    data, dlen = parts["data"], parts["data_len"]
    chain("rans_encode_batch", lambda d: rans_encode_batch(d, dlen, freqs, cum)[0], (data,))
    est, elen = rans_encode_batch(data, dlen, freqs, cum)
    chain(
        "rans_decode_batch (pallas)",
        lambda s: rans_decode_batch(s, jnp.zeros((B,), jnp.int32), dlen, freqs, cum, L),
        (est,),
    )

    chain("press_srans_batch", lambda s: press_srans_batch(s, n, freqs, cum)[0], (sig,))
    sst, sln = press_srans_batch(sig, n, freqs, cum)
    chain("depress_srans_batch", lambda s: depress_srans_batch(s, n, freqs, cum, L), (sst,))
    chain(
        "vbbe21_decode (one pass)",
        lambda s: vbbe21_decode_batch(s, jnp.full((B,), 2, jnp.int32), n - 1,
                                      jnp.zeros((B, L), jnp.int32), L)[0],
        (sst,),
    )
    keep = v > 520
    chain("monotone_compact [B,L] i32", lambda vv: monotone_compact(vv, keep)[0], (v,))
    chain("rowwise_shift_left [B,M]", lambda s: rowwise_shift_left(s, n, s.shape[1]), (sst,))


if __name__ == "__main__":
    main()
