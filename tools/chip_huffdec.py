"""Chip measurement: chunked TPU Huffman decode vs the native host LUT
decoder (COVERAGE item 6 — an argument becomes a number)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
import jax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.engine.huffdec import huffman_decode_tpu
from honours_tpu.kernels.huffman_np import huffman_decode, huffman_encode
from honours_tpu.io.blow5 import read_signals
from honours_tpu.tables.huffman import na12878_table
from honours_tpu.transforms.core import zigdelta

t = na12878_table()
reads = read_signals("tests/data/three-reads.blow5")
datas, streams = [], []
for s in reads * 8:  # ~2 MB of residual bytes
    zd = zigdelta(np.asarray(s, np.int16))
    vb = PAYLOAD["vbbe21"][0](zd[1:])
    exlen = exblock_len(vb, 0, "vbbe21")
    d = np.frombuffer(vb, np.uint8, offset=exlen)
    datas.append(d)
    streams.append(huffman_encode(d, t))
ns = [d.size for d in datas]
NB = sum(ns)
print(f"corpus: {NB/1e6:.1f} MB residual bytes", flush=True)

outs = huffman_decode_tpu(streams, ns, t)  # warm/compile
t0 = time.time()
for _ in range(3):
    outs = huffman_decode_tpu(streams, ns, t)
dt_tpu = (time.time() - t0) / 3
for d, o in zip(datas, outs):
    assert np.array_equal(d, o)
print(f"TPU chunked decode: {dt_tpu*1e3:.1f} ms  {NB/dt_tpu/1e9:.3f} GB/s",
      flush=True)

t0 = time.time()
for _ in range(3):
    ref = [huffman_decode(st, n, t) for st, n in zip(streams, ns)]
dt_host = (time.time() - t0) / 3
print(f"native host LUT:    {dt_host*1e3:.1f} ms  {NB/dt_host/1e9:.3f} GB/s",
      flush=True)
print(f"ratio host/tpu: {dt_tpu/dt_host:.2f}x", flush=True)
