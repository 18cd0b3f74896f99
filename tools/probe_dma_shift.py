"""Probe: per-row dynamic-offset DMA as a single-pass rowwise shift.

If make_async_copy supports arbitrary (unaligned) lane offsets on u8/i32
HBM refs, every rowwise_shift_left/right (18 log-shift passes today)
collapses to one DMA read+write.
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
from honours_tpu.engine.permute import rowwise_shift_left

B, M = 256, 139264
W = 131072
ROWS = 8


def _kernel(shift_ref, in_ref, out_ref, scratch, sem, sem2):
    b = pl.program_id(0)
    for q in range(ROWS):
        src = in_ref.at[b * ROWS + q, pl.ds(shift_ref[b * ROWS + q], W)]
        pltpu.make_async_copy(src, scratch.at[q], sem.at[q]).start()
    for q in range(ROWS):
        pltpu.make_async_copy(
            in_ref.at[b * ROWS + q, pl.ds(shift_ref[b * ROWS + q], W)],
            scratch.at[q], sem.at[q],
        ).wait()
    out_dma = pltpu.make_async_copy(
        scratch, out_ref.at[pl.ds(b * ROWS, ROWS), :], sem2
    )
    out_dma.start()
    out_dma.wait()


@jax.jit
def dma_shift(buf, shift):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // ROWS,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((ROWS, W), jnp.uint8),
            pltpu.SemaphoreType.DMA((ROWS,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((B, W), jnp.uint8),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=(ROWS * W * 3) + (4 << 20)
        ),
    )(shift, buf)


rng = np.random.default_rng(0)
buf = jnp.asarray(rng.integers(0, 255, (B, M)), jnp.uint8)
# pad so shift+W stays in range
shift = jnp.asarray(rng.integers(0, M - W, B), jnp.int32)

x0 = jnp.zeros((), jnp.float32) + 1
float(x0)
t0 = time.time()
for _ in range(5):
    float(x0 + 1)
RTT = (time.time() - t0) / 5

try:
    out = dma_shift(buf, shift)
    outn = np.asarray(out)
    bufn, shiftn = np.asarray(buf), np.asarray(shift)
    want = np.stack([bufn[i, s:s + W] for i, s in enumerate(shiftn)])
    print("dma-shift correct:", np.array_equal(outn, want), flush=True)
    t0 = time.time()
    for _ in range(10):
        out = dma_shift(buf, shift)
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = (time.time() - t0 - RTT) / 10
    print(f"dma-shift: {dt*1e3:.2f} ms for [256,{W}] u8", flush=True)
except Exception as e:
    print("dma-shift FAIL:", type(e).__name__, str(e).splitlines()[0][:200],
          flush=True)

f = jax.jit(lambda b, s: rowwise_shift_left(b, s, W))
r = f(buf, shift)
float(jnp.sum(r[:1, :1].astype(jnp.float32)))
t0 = time.time()
for _ in range(10):
    r = f(buf, shift)
float(jnp.sum(r[:1, :1].astype(jnp.float32)))
dt = (time.time() - t0 - RTT) / 10
print(f"xla log-shift: {dt*1e3:.2f} ms", flush=True)
