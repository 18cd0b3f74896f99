"""Batched TPU stall segmenter (the jnn adaptor/stall detector).

jit/scan formulation of the serial state machine in native/segment.c
(itself the reference's sigtk jnn_core/jnn_raw,
press/sigtk/src/jnn.c:185-288, cDNA parameter profile): clamp to
[0, 1200], global float32 mean/std thresholds, then a run state machine
that counts in-band samples, tolerates short excursions, and merges
nearby segments.

TPU mapping: the per-sample transition is inherently sequential per
read, but reads are many — the machine runs as ONE lax.scan over sample
index with all state vectors batched over reads, so a [B, L] block
segments in a single compiled loop.  Mean/std accumulate in float64 and
round to float32 (the C path accumulates serially in float32; the two
agree on real signal — asserted against native/segment.c on the fixture
reads in tests/test_segment_tpu.py — but can differ on adversarial
knife-edge inputs, which is why the stall codecs keep the C oracle for
byte-parity paths).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

CLAMP_MAX = 1200.0
CLAMP_MIN = 0.0
STD_SCALE = 0.75
CORRECTOR = 50
SEG_DIST = 50
WINDOW = 150
STALL_LEN = 0.25
ERROR = 5


@functools.partial(jax.jit, static_argnames=())
def find_stall_batch(sig, n):
    """[B, L] int16 signals (first n valid) -> (exists [B] bool,
    start [B] i32, length [B] i32) of the first stall segment per read.

    Matches native.find_stall / press/press.c:7728-7746 semantics.
    """
    B, L = sig.shape
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    valid = pos < n[:, None]
    a = jnp.clip(sig.astype(jnp.float32), CLAMP_MIN, CLAMP_MAX)
    a = jnp.where(valid, a, 0.0)

    nf = jnp.maximum(n, 1).astype(jnp.float32)
    mean = (jnp.sum(a.astype(jnp.float64), axis=1).astype(jnp.float32) / nf)
    d = jnp.where(valid, a - mean[:, None], 0.0)
    var = (
        jnp.sum((d * d).astype(jnp.float64), axis=1).astype(jnp.float32) / nf
    )
    sd = jnp.sqrt(var)
    top = mean + sd * STD_SCALE
    bot = mean - sd * STD_SCALE

    inband = (a < top[:, None]) & (a > bot[:, None]) & valid

    def step(state, xs):
        (inseg, count, err, run_err, w, nsegs,
         first_x, first_y, last_y, seg_start) = state
        inb, vld, i = xs

        c1 = vld & inb
        c2 = vld & ~inb & inseg & (err < ERROR)
        emit_ok = (count >= WINDOW) | (
            (nsegs == 0) & (count.astype(jnp.float32) >= WINDOW * STALL_LEN)
        )
        c3 = vld & ~inb & inseg & ~c2 & emit_ok
        c4 = vld & ~inb & inseg & ~c2 & ~c3

        # branch 1: in-band sample extends/starts a run
        seg_start1 = jnp.where(~inseg, i, seg_start)
        count1 = count + 1
        w1 = w + 1
        dec1 = (count1 >= WINDOW) & (count1 >= w1) & (count1 % w1 == 0)
        err1 = err - dec1.astype(jnp.int32)

        # branch 2: tolerated excursion
        count2 = count + 1
        err2 = err + 1
        run_err2 = run_err + 1
        dec2 = (count2 >= WINDOW) & (count2 >= w) & (count2 % w == 0)
        err2 = err2 - dec2.astype(jnp.int32)

        # branch 3: emit / merge segment
        seg_end = i - run_err
        merge = (nsegs > 0) & ((seg_start - last_y) < SEG_DIST)
        nsegs3 = jnp.where(merge, nsegs, nsegs + 1)
        last_y3 = seg_end
        first_x3 = jnp.where(~merge & (nsegs3 == 1), seg_start, first_x)
        first_y3 = jnp.where(
            (merge & (nsegs == 1)) | (~merge & (nsegs3 == 1)),
            seg_end, first_y,
        )

        inseg_n = jnp.where(c1, True, jnp.where(c3 | c4, False, inseg))
        count_n = jnp.where(c1, count1,
                            jnp.where(c2, count2,
                                      jnp.where(c3 | c4, 0, count)))
        err_n = jnp.where(c1, err1,
                          jnp.where(c2, err2,
                                    jnp.where(c3 | c4, 0, err)))
        run_err_n = jnp.where(c1, 0,
                              jnp.where(c2, run_err2,
                                        jnp.where(c3 | c4, 0, run_err)))
        w_n = jnp.where(c1, w1, w)
        nsegs_n = jnp.where(c3, nsegs3, nsegs)
        first_x_n = jnp.where(c3, first_x3, first_x)
        first_y_n = jnp.where(c3, first_y3, first_y)
        last_y_n = jnp.where(c3, last_y3, last_y)
        seg_start_n = jnp.where(c1, seg_start1, seg_start)
        return (inseg_n, count_n, err_n, run_err_n, w_n, nsegs_n,
                first_x_n, first_y_n, last_y_n, seg_start_n), None

    z = jnp.zeros((B,), jnp.int32)
    state0 = (
        jnp.zeros((B,), bool), z, z, z, jnp.full((B,), CORRECTOR, jnp.int32),
        z, z, z, z, z,
    )
    xs = (
        jnp.transpose(inband),           # [L, B]
        jnp.transpose(valid),
        jnp.arange(L, dtype=jnp.int32)[:, None] * jnp.ones((1, B), jnp.int32),
    )
    # unroll amortizes the per-step loop overhead of the 65536-iteration
    # serial machine (each step is only a few [B]-wide vector ops)
    state, _ = jax.lax.scan(step, state0, xs, unroll=16)
    nsegs, first_x, first_y = state[5], state[6], state[7]
    exists = nsegs > 0
    start = jnp.where(exists, first_x, 0)
    length = jnp.where(exists, first_y - first_x + 1, 0)
    return exists, start, length
