"""Test configuration.

Tests run on a virtual 8-device CPU mesh so the multi-chip sharding paths
compile and execute without TPU hardware (the driver separately dry-runs the
multi-chip path; benches run on the real chip).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The axon TPU plugin pins jax_platforms via jax.config at interpreter
# start (sitecustomize), so the env var alone is NOT enough — override
# through jax.config before any backend is initialized.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", "/tmp/htpu_test_xla_cache"
)
import jax

jax.config.update("jax_platforms", "cpu")
# the per-module clear_caches below frees executables to keep the XLA
# compiler alive over the whole suite; the persistent disk cache turns
# the forced recompiles into cache hits so wall time stays sane
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.05)
jax.config.update(
    "jax_persistent_cache_min_entry_size_bytes", -1
)

import pathlib

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
FIXTURE = REPO / "tests" / "data" / "three-reads.blow5"
GOLDEN = REPO / "tests" / "golden"


@pytest.fixture(scope="session")
def fixture_reads():
    from honours_tpu.io.blow5 import read_signals

    return read_signals(str(FIXTURE))


@pytest.fixture(scope="session")
def read0(fixture_reads):
    return fixture_reads[0]


def golden_bytes(method: str, read_idx: int = 0) -> bytes:
    """Load a captured reference stream (full bytes only exist for read 0)."""
    p = GOLDEN / f"read{read_idx}" / f"{method}.{read_idx}.press"
    return p.read_bytes()


def golden_manifest() -> dict:
    import json

    return json.loads((GOLDEN / "manifest.json").read_text())


def rng_signals(seed=0, n_cases=12):
    """Adversarial + random int16 arrays exercising codec edge cases."""
    rng = np.random.default_rng(seed)
    cases = [
        np.zeros(1, dtype=np.int16),
        np.zeros(7, dtype=np.int16),
        np.array([1], dtype=np.int16),
        np.array([-1, 32767, -32768, 0, 255, 256, -255, -256], dtype=np.int16),
        np.full(1000, 483, dtype=np.int16),  # all-equal -> zero deltas
        np.arange(0, 2000, 2, dtype=np.int16),  # constant small delta
        rng.integers(400, 600, 777).astype(np.int16),  # typical signal band
        rng.integers(-32768, 32768, 513).astype(np.int16),  # full range
        np.tile(np.array([0, 30000], dtype=np.int16), 300),  # >255-delta bursts
        np.concatenate(
            [np.full(300, 500, np.int16), rng.integers(0, 1200, 300).astype(np.int16)]
        ),
        rng.integers(460, 480, 100_000).astype(np.int16),  # long quiet read
        np.array([256], dtype=np.int16),  # single exception, nex==1 framing
    ]
    return cases[:n_cases]


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_after_module():
    """Free compiled executables between test modules.

    The full suite compiles hundreds of XLA CPU executables; without
    this the accumulated allocations eventually abort the XLA compiler
    partway through the run (reproduced at test_runner when running the
    whole suite, while every module passes standalone)."""
    yield
    jax.clear_caches()
