"""Chip validation: a 500K-sample synthetic read through the public
runner (press --tpu path) at the 512Ki bucket (VERDICT r3 item 5).
Real NA12878 reads average ~113K samples; this covers the long tail."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from honours_tpu.engine import runner

rng = np.random.default_rng(13)
steps = rng.integers(-30, 31, size=500_000)
steps[::301] = rng.integers(-800, 800, size=(500_000 + 300) // 301)
sig = np.cumsum(steps).clip(-2048, 2047).astype(np.int16)

for kind in ("srans2_vbbe21_zd", "svb12_zd"):
    t0 = time.time()
    try:
        streams = runner.press_signals_tpu([sig], kind)
        back = runner.depress_signals_tpu(streams, [sig.size], kind)
        ok = np.array_equal(back[0], sig)
        print(f"{kind}: 500K-sample round trip lossless={ok}, "
              f"{len(streams[0])} bytes (ratio "
              f"{sig.size * 2 / len(streams[0]):.3f}), "
              f"{time.time() - t0:.0f}s incl compile", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{kind}: FAILED {type(e).__name__}: {e}", flush=True)
