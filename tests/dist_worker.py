"""Worker for the 2-process jax.distributed CPU test (test_shard.py).

Each process owns 2 virtual CPU devices; the 4-device global `reads`
mesh spans both.  Exercises shard.mesh.init_distributed, the psum'd
metrics, the global length gather, and the per-process ordered payload
windows, cross-checking streams against the serial host codec.

Launched as:
  JAX_COORDINATOR_ADDRESS=... JAX_NUM_PROCESSES=2 JAX_PROCESS_ID=k \
      python tests/dist_worker.py
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from honours_tpu.shard.mesh import (
    gather_lengths,
    init_distributed,
    iter_ordered_payloads,
    make_mesh,
    _metrics_psum,
)


def main():
    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    from honours_tpu.codecs.base import get as get_codec
    from honours_tpu.engine.pipeline import (
        canned_o1_device_tables,
        press_srans2_batch,
    )

    mesh = make_mesh()
    tabs = canned_o1_device_tables()
    B, L = 8, 256
    rng = np.random.default_rng(5)
    sig = rng.integers(400, 700, (B, L)).astype(np.int16)
    n = np.full((B,), L, np.int32)
    n[3] = 100
    n[7] = 1

    sh2 = NamedSharding(mesh, P("reads", None))
    sh1 = NamedSharding(mesh, P("reads"))
    sig_s = jax.make_array_from_callback(
        (B, L), sh2, lambda idx: sig[idx]
    )
    n_s = jax.make_array_from_callback((B,), sh1, lambda idx: n[idx])

    stream, out_len = jax.jit(
        lambda s, nn: press_srans2_batch(s, nn, tabs)
    )(sig_s, n_s)
    comp, raw = _metrics_psum(mesh, out_len, n_s)
    assert int(raw) == int(n.sum()) * 2, (int(raw), int(n.sum()) * 2)

    lens = gather_lengths(out_len)
    assert lens.shape == (B,), lens.shape

    host = get_codec("srans2_vbbe21_zd")
    mine = []
    for g, blob in iter_ordered_payloads(stream, out_len, window_rows=2):
        assert len(blob) == lens[g], (g, len(blob), lens[g])
        assert blob == host.press(sig[g, : n[g]]), f"row {g} mismatch"
        mine.append(g)
    # each process yields exactly its own half, in global order
    assert mine == sorted(mine) and len(mine) == B // 2, mine
    assert int(comp) == int(lens.sum()), (int(comp), int(lens.sum()))
    print(f"DIST OK pid={jax.process_index()} rows={mine}", flush=True)


if __name__ == "__main__":
    main()
