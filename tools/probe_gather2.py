"""Probe 2: matching-shape take_along_axis (tpu.dynamic_gather) inside
Pallas kernels, correctness + cost at rANS-decode-like shapes."""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RTT = None


def rtt():
    global RTT
    x = jnp.zeros((), jnp.float32) + 1
    float(x)
    t0 = time.time()
    for _ in range(5):
        float(x + 1)
    RTT = (time.time() - t0) / 5
    print(f"RTT {RTT*1e3:.1f} ms", flush=True)


def try_fn(name, fn, *args, expect=None):
    try:
        out = np.asarray(jax.jit(fn)(*args))
        ok = True if expect is None else np.array_equal(out, expect)
        print(f"{name}: OK match={ok}", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e).splitlines()[0][:140]}",
              flush=True)
        return False


# A) matching-shape taa axis=1: x [8, 384] i32
def kA(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=1)


x = jnp.asarray(np.random.randint(0, 255, (8, 384)), jnp.int32)
ix = jnp.asarray(np.random.randint(0, 384, (8, 384)), jnp.int32)
fA = lambda a, b: pl.pallas_call(
    kA, out_shape=jax.ShapeDtypeStruct((8, 384), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
try_fn("taa-1-[8,384]", fA, x, ix,
       expect=np.take_along_axis(np.asarray(x), np.asarray(ix), 1))

# B) wider: [8, 4096]
xw = jnp.asarray(np.random.randint(0, 1 << 20, (8, 4096)), jnp.int32)
iw = jnp.asarray(np.random.randint(0, 4096, (8, 4096)), jnp.int32)
fB = lambda a, b: pl.pallas_call(
    kA, out_shape=jax.ShapeDtypeStruct((8, 4096), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
try_fn("taa-1-[8,4096]", fB, xw, iw,
       expect=np.take_along_axis(np.asarray(xw), np.asarray(iw), 1))

# B2) [32, 4096] (more sublanes)
x2 = jnp.asarray(np.random.randint(0, 1 << 20, (32, 4096)), jnp.int32)
i2 = jnp.asarray(np.random.randint(0, 4096, (32, 4096)), jnp.int32)
fB2 = lambda a, b: pl.pallas_call(
    kA, out_shape=jax.ShapeDtypeStruct((32, 4096), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
try_fn("taa-1-[32,4096]", fB2, x2, i2,
       expect=np.take_along_axis(np.asarray(x2), np.asarray(i2), 1))

# C) axis=0 (sublane gather): x [64, 128], idx [64, 128]
def kC(x_ref, i_ref, o_ref):
    o_ref[:, :] = jnp.take_along_axis(x_ref[:, :], i_ref[:, :], axis=0)


xs = jnp.asarray(np.random.randint(0, 255, (64, 128)), jnp.int32)
isub = jnp.asarray(np.random.randint(0, 64, (64, 128)), jnp.int32)
fC = lambda a, b: pl.pallas_call(
    kC, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.int32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b)
try_fn("taa-0-[64,128]", fC, xs, isub,
       expect=np.take_along_axis(np.asarray(xs), np.asarray(isub), 0))

rtt()


# D) timing: loop kernel, N iterations of gather vs one-hot, [8, W]
def timing_kernel_gather(W, iters):
    def k(x_ref, i_ref, o_ref):
        def body(t, acc):
            g = jnp.take_along_axis(x_ref[:, :], (i_ref[:, :] + t) % W, axis=1)
            return acc + g
        o_ref[:, :] = jax.lax.fori_loop(0, iters, body,
                                        jnp.zeros((8, W), jnp.int32))
    xq = jnp.asarray(np.random.randint(0, 255, (8, W)), jnp.int32)
    iq = jnp.asarray(np.random.randint(0, W, (8, W)), jnp.int32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b))
    r = f(xq, iq); float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(5):
        r = f(xq, iq)
    float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    dt = (time.time() - t0 - RTT) / 5
    print(f"gather [8,{W}] x{iters}: {dt*1e6/iters:.2f} us/iter", flush=True)


def timing_kernel_onehot(W, K, iters):
    """one-hot fetch of K indexed values from [8, W] window (current style)."""
    def k(x_ref, i_ref, o_ref):
        wcols = jax.lax.broadcasted_iota(jnp.int32, (8, K, W), 2)
        winf = x_ref[:, :].astype(jnp.float32)[:, None, :]
        def body(t, acc):
            idx = (i_ref[:, :K] + t) % W
            oh = (idx[:, :, None] == wcols).astype(jnp.float32)
            v = jnp.sum(oh * winf, axis=-1).astype(jnp.int32)
            return acc + jnp.pad(v, ((0, 0), (0, W - K)))
        o_ref[:, :] = jax.lax.fori_loop(0, iters, body,
                                        jnp.zeros((8, W), jnp.int32))
    xq = jnp.asarray(np.random.randint(0, 255, (8, W)), jnp.int32)
    iq = jnp.asarray(np.random.randint(0, W, (8, W)), jnp.int32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((8, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(a, b))
    r = f(xq, iq); float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(5):
        r = f(xq, iq)
    float(jnp.sum(r[:1, :1].astype(jnp.float32)))
    dt = (time.time() - t0 - RTT) / 5
    print(f"onehot [8,{W}]->K={K} x{iters}: {dt*1e6/iters:.2f} us/iter",
          flush=True)


timing_kernel_gather(128, 4096)
timing_kernel_gather(384, 4096)
timing_kernel_gather(512, 4096)
timing_kernel_gather(4096, 1024)
timing_kernel_onehot(384, 64, 4096)
