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
    with stream/out_len still sharded; use gather_lengths /
    iter_ordered_payloads for the ragged ordered gather.
    """
    sig_s, n_s = shard_batch(mesh, jnp.asarray(sig), jnp.asarray(n))
    reps = [
        jax.device_put(t, NamedSharding(mesh, P(*(None,) * t.ndim)))
        for t in map(jnp.asarray, tables)
    ]
    stream, out_len = jax.jit(encode_fn)(sig_s, n_s, *reps)
    comp, raw = _metrics_psum(mesh, out_len, n_s)
    return stream, out_len, int(comp), int(raw)


def assert_no_collectives(fn, *args):
    """Compile fn(*args) and assert GSPMD inserted no cross-device data
    movement into the body (the reads axis is embarrassingly parallel —
    any all-gather/permute means a sharding regression)."""
    txt = jax.jit(fn).lower(*args).compile().as_text()
    bad = [
        op for op in
        ("all-gather", "all-to-all", "collective-permute", "all-reduce")
        if op in txt
    ]
    assert not bad, f"encode body resharded: found {bad}"
    return txt


def gather_lengths(out_len) -> np.ndarray:
    """Global [B] compressed lengths on every process (phase 1 of the
    ragged ordered gather: lengths travel first, SURVEY §2.6)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(out_len, tiled=True))
    return np.asarray(jax.device_get(out_len))


def iter_ordered_payloads(stream, out_len, window_rows: int = 64):
    """Phase 2: yield (global_row, payload_bytes) in global row order for
    every row whose shard this process addresses, fetching at most
    `window_rows` rows of the padded stream buffer per device transfer —
    the whole corpus is never materialized at once.

    Single-process: yields every row in order.  Multi-host: each process
    yields its own rows (still globally ordered among themselves); file
    assembly is a concatenation keyed by global_row.
    """
    lens = gather_lengths(out_len)
    shards = sorted(
        stream.addressable_shards,
        key=lambda s: s.index[0].start or 0,
    )
    for shard in shards:
        r0 = shard.index[0].start or 0
        rows = shard.data.shape[0]
        for j0 in range(0, rows, window_rows):
            j1 = min(j0 + window_rows, rows)
            window = np.asarray(jax.device_get(shard.data[j0:j1]))
            for j in range(j1 - j0):
                g = r0 + j0 + j
                yield g, window[j, : lens[g]].tobytes()
