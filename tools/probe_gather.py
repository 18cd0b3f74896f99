"""Probe Mosaic/Pallas TPU support for dynamic gathers (jax 0.9.0, v5e).

If in-kernel gathers lower, the rANS decode kernels can replace their
one-hot matmul table lookups and window fetches with O(1) gathers.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def try_kernel(name, fn, *args, expect=None):
    try:
        out = jax.jit(fn)(*args)
        out = np.asarray(out)
        ok = True if expect is None else np.array_equal(out, expect)
        print(f"{name}: OK match={ok} out[:4]={out.reshape(-1)[:4]}")
    except Exception as e:
        msg = str(e).split("\n")[0][:160]
        print(f"{name}: FAIL {type(e).__name__}: {msg}")


# 1) 1-D table gather along lanes: tab [1, 4096], idx [8, 128]
def k_take1d(tab_ref, idx_ref, out_ref):
    tab = tab_ref[0, :]
    idx = idx_ref[:, :]
    out_ref[:, :] = jnp.take(tab, idx, axis=0)


tab = jnp.arange(4096, dtype=jnp.int32) * 3
idx = jnp.asarray(np.random.randint(0, 4096, (8, 128)), jnp.int32)
f = lambda tab, idx: pl.pallas_call(
    k_take1d,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(tab.reshape(1, -1), idx)
try_kernel("take-1d-4096", f, tab, idx, expect=np.asarray(tab)[np.asarray(idx)])

# 2) take_along_axis within rows: win [8, 512], idx [8, 128] -> [8, 128]
def k_taa(win_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(win_ref[:, :], idx_ref[:, :], axis=1)


win = jnp.asarray(np.random.randint(0, 255, (8, 512)), jnp.int32)
idx2 = jnp.asarray(np.random.randint(0, 512, (8, 128)), jnp.int32)
f2 = lambda w, i: pl.pallas_call(
    k_taa,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(w, i)
try_kernel(
    "take-along-axis-rows", f2, win, idx2,
    expect=np.take_along_axis(np.asarray(win), np.asarray(idx2), axis=1),
)

# 3) 2-D table gather: tab [64, 4096] rows, row idx + col idx both [8, 128]
def k_take2d(tab_ref, r_ref, c_ref, out_ref):
    flat = tab_ref[:, :].reshape(1, -1)[0, :]
    idx = r_ref[:, :] * 4096 + c_ref[:, :]
    out_ref[:, :] = jnp.take(flat, idx, axis=0)


tab2 = jnp.asarray(np.random.randint(0, 1 << 30, (64, 4096)), jnp.int32)
ri = jnp.asarray(np.random.randint(0, 64, (8, 128)), jnp.int32)
ci = jnp.asarray(np.random.randint(0, 4096, (8, 128)), jnp.int32)
f3 = lambda t, r, c: pl.pallas_call(
    k_take2d,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(t, r, c)
try_kernel(
    "take-2d-64x4096-flat", f3, tab2, ri, ci,
    expect=np.asarray(tab2)[np.asarray(ri), np.asarray(ci)],
)

# 4) u8 gather
def k_take_u8(tab_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take(tab_ref[0, :], idx_ref[:, :], axis=0)


tabu8 = jnp.asarray(np.random.randint(0, 255, (1, 4096)), jnp.uint8)
f4 = lambda t, i: pl.pallas_call(
    k_take_u8,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint8),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(t, i)
try_kernel("take-1d-u8", f4, tabu8, idx,
           expect=np.asarray(tabu8)[0][np.asarray(idx)])

# 5) dynamic_gather via lax.gather-style: tab [8, 4096] per-row windows,
#    per-row idx [8, 128] (this IS the refill pattern)
def k_refill(body_ref, idx_ref, out_ref):
    out_ref[:, :] = jnp.take_along_axis(body_ref[:, :], idx_ref[:, :], axis=1)


body = jnp.asarray(np.random.randint(0, 255, (8, 65536)), jnp.int32)
bidx = jnp.asarray(np.random.randint(0, 65536, (8, 128)), jnp.int32)
f5 = lambda b, i: pl.pallas_call(
    k_refill,
    out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
)(b, i)
try_kernel(
    "take-along-axis-64k", f5, body, bidx,
    expect=np.take_along_axis(np.asarray(body), np.asarray(bidx), axis=1),
)
