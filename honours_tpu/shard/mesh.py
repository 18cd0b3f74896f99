"""Data-parallel sharding of read batches over a device mesh.

The reference is single-threaded C (SURVEY §2.5); the parallel layer is
ours by design: reads shard over a 1-D `reads` mesh axis
(`jax.sharding`), static codec tables are replicated, per-read compressed
lengths/payloads gather back in original order, and aggregate benchmark
metrics reduce with a psum — ICI collectives only, no host round trips
(SURVEY §2.6).

Multi-host: `init_distributed()` wires jax.distributed when launched with
coordinator env vars; the same mesh code then spans all hosts' chips
(reads axis across DCN+ICI).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed():
    """Initialize jax.distributed from standard env vars (no-op if absent)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("JAX_PROCESS_ID", "0")),
        )


def make_mesh(devices=None, axis: str = "reads") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, sig, n):
    """Place [B, L] batch row-sharded over the reads axis."""
    sharding = NamedSharding(mesh, P("reads", None))
    sharding1 = NamedSharding(mesh, P("reads"))
    return jax.device_put(sig, sharding), jax.device_put(n, sharding1)


def pad_rows_to_devices(sig: np.ndarray, n: np.ndarray, n_devices: int):
    """Pad the batch dim to a multiple of the mesh size (pad rows n=0)."""
    B = sig.shape[0]
    Bp = -(-B // n_devices) * n_devices
    if Bp != B:
        sig = np.concatenate(
            [sig, np.zeros((Bp - B, sig.shape[1]), sig.dtype)], axis=0
        )
        n = np.concatenate([n, np.zeros(Bp - B, n.dtype)])
    return sig, n


@functools.partial(jax.jit, static_argnames=("mesh",))
def _metrics_psum(mesh, out_len, n):
    # aggregate compressed/raw byte totals with an all-reduce over the mesh
    def inner(ol, nn):
        comp = jnp.sum(ol)
        raw = jnp.sum(nn) * 2
        return (
            jax.lax.psum(comp, "reads"),
            jax.lax.psum(raw, "reads"),
        )

    from jax import shard_map

    return shard_map(
        inner,
        mesh=mesh,
        in_specs=(P("reads"), P("reads")),
        out_specs=(P(), P()),
    )(out_len, n)


def sharded_encode(mesh: Mesh, encode_fn, sig, n, *tables):
    """Run a batched encode over the mesh.

    encode_fn(sig, n, *tables) -> (stream, out_len); tables replicate, the
    batch shards by rows.  Returns (stream, out_len, comp_bytes, raw_bytes)
    with stream/out_len sharded (gather happens lazily on host fetch —
    the ordered gather).
    """
    sig_s, n_s = shard_batch(mesh, jnp.asarray(sig), jnp.asarray(n))
    reps = [
        jax.device_put(t, NamedSharding(mesh, P(*(None,) * t.ndim)))
        for t in map(jnp.asarray, tables)
    ]
    stream, out_len = jax.jit(encode_fn)(sig_s, n_s, *reps)
    comp, raw = _metrics_psum(mesh, out_len, n_s)
    return stream, out_len, int(comp), int(raw)
