"""Benchmark harness: round-trip every method over a SLOW5/BLOW5 file.

Reproduces the reference driver's TSV schema (press/test.h:47-54):
  method  pressbound_bytes  press_bytes  press_ratio  depress_bytes
  pressbound_time  press_time  depress_time
with press_ratio = depress_bytes / press_bytes (press/test.c:40), totals
accumulated per method over all reads, and every read verified
element-wise (the lossless check IS the test, press/test.c:402-405).

A per-read variant (--per-read) adds a leading `read` column, mirroring
press/test_read.h.

Usage:
  python -m honours_tpu.bench.harness FILE.blow5 [--methods a,b,...]
      [--per-read] [--list]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from honours_tpu.codecs import base as registry
from honours_tpu.io.blow5 import read_blow5

HDR = (
    "method\tpressbound_bytes\tpress_bytes\tpress_ratio\tdepress_bytes\t"
    "pressbound_time\tpress_time\tdepress_time"
)

#: methods run by the reference driver (press/test.c:6110-6198), in order,
#: restricted to what exists here under the same or mapped names
DEFAULT_METHODS = [
    "none",
    "uint11",
    "uint",
    "uint_submin",
    "uint_zd",
    "uint_zsm",
    "zlib_uint_submin",
    "zlib_uint_zd",
    "zstd_uint_submin",
    "zstd_uint_zd",
    "bzip2_uint_zd",
    "fast_lzma2_uint_zd",
    "flat_uint_submin",
    "zlib",
    "zstd",
    "bzip2",
    "fast_lzma2",
    "svb",
    "svb0124",
    "svb12",
    "svb_zd",
    "svb0124_zd",
    "svb12_zd",
    "zlib_svb_zd",
    "zlib_svb0124_zd",
    "zlib_svb12_zd",
    "zstd_svb_zd",
    "zstd_svb0124_zd",
    "zstd_svb12_zd",
    "bzip2_svb12_zd",
    "fast_lzma2_svb12_zd",
    "flac",
    "zstd_flac",
    "vb1e2_zd",
    "vbe21_zd",
    "vbbe21_zd",
    "vbsbe21_zd",
    "vbsse21_zd",
    "zstd_vb1e2_zd",
    "zstd_vbe21_zd",
    "zlib_vbe21_zd",
    "zstd_vbbe21_zd",
    "zlib_vbbe21_zd",
    "zstd_vbsbe21_zd",
    "zlib_vbsbe21_zd",
    "zstd_vbsse21_zd",
    "zlib_vbsse21_zd",
    "huffman_vbe21_zd",
    "shuffman_vbe21_zd",
    "rice_vbe21_zd",
    "rc_zd",
    "rc_vbe21_zd",
    "rcc_vbe21_zd",
    "rccm_vbe21_zd",
    "rccdf_vbe21_zd",
    "huffman_vbbe21_zd",
    "shuffman_vbbe21_zd",
    "rice_vbbe21_zd",
    "rc_vbbe21_zd",
    "rcc_vbbe21_zd",
    "rccm_vbbe21_zd",
    "rccdf_vbbe21_zd",
    "huffman_vbsbe21_zd",
    "shuffman_vbsbe21_zd",
    "rice_vbsbe21_zd",
    "rc_vbsbe21_zd",
    "rcc_vbsbe21_zd",
    "rccm_vbsbe21_zd",
    "rccdf_vbsbe21_zd",
    "huffman_vbsse21_zd",
    "shuffman_vbsse21_zd",
    "rice_vbsse21_zd",
    "rc_vbsse21_zd",
    "rcc_vbsse21_zd",
    "rccm_vbsse21_zd",
    "rccdf_vbsse21_zd",
    "rccm_vbbe21_submin",
    "rccm_svbbe21_zd",
    "dstall_fz_1500",
    "dstall_fz",
    "rccm_svb_zd",
    "rccm_svb12_zd",
    "srans_vbbe21_zd",
    "srans2_vbbe21_zd",
    "srans3_vbbe21_zd",
    "dstall_srans2",
    "drans_vbbe21_zd",
    "dstall_drans",
    "hasgam_vbsse21_zdq",
    "zlib_hasgam_vbsse21_zdq",
    "zstd_hasgam_vbsse21_zdq",
]


def run_method(codec, signals, per_read=False, out=None):
    out = out or sys.stdout
    tot = dict.fromkeys(
        ["bound", "press", "raw", "t_bound", "t_press", "t_depress"], 0.0
    )
    for idx, sig in enumerate(signals):
        t0 = time.perf_counter()
        bound = codec.bound(sig.size)
        t1 = time.perf_counter()
        stream = codec.press(sig)
        t2 = time.perf_counter()
        back = codec.depress(stream, sig.size)
        t3 = time.perf_counter()
        if not np.array_equal(back, sig):
            raise AssertionError(f"{codec.name}: lossless check failed read {idx}")
        raw = sig.size * 2
        if per_read:
            print(
                f"{idx}\t{codec.name}\t{bound:.1f}\t{len(stream):.1f}\t"
                f"{raw / len(stream):.6f}\t{raw:.1f}\t{t1 - t0:.6f}\t"
                f"{t2 - t1:.6f}\t{t3 - t2:.6f}",
                file=out,
            )
        tot["bound"] += bound
        tot["press"] += len(stream)
        tot["raw"] += raw
        tot["t_bound"] += t1 - t0
        tot["t_press"] += t2 - t1
        tot["t_depress"] += t3 - t2
    if not per_read:
        print(
            f"{codec.name}\t{tot['bound']:.1f}\t{tot['press']:.1f}\t"
            f"{tot['raw'] / tot['press']:.6f}\t{tot['raw']:.1f}\t"
            f"{tot['t_bound']:.6f}\t{tot['t_press']:.6f}\t"
            f"{tot['t_depress']:.6f}",
            file=out,
        )


def run_method_tpu(name: str, signals, out=None):
    """One TSV row for an engine-backed method through the batched path
    (engine/runner.py: bucket -> jitted engine -> ordered streams).

    NOTE: press_time / depress_time here are END-TO-END wall times of the
    user path — host bucketing, per-row tobytes, and any overflow
    fallback re-encodes are included.  They are NOT chip-kernel
    throughput numbers; bench.py reports those separately."""
    from honours_tpu.engine import runner

    out = out or sys.stdout
    codec = registry.get(name)
    raw = sum(s.size * 2 for s in signals)
    t0 = time.perf_counter()
    bound = sum(codec.bound(s.size) for s in signals)
    t1 = time.perf_counter()
    streams = runner.press_signals_tpu(signals, name)
    t2 = time.perf_counter()
    back = runner.depress_signals_tpu(
        streams, [s.size for s in signals], name
    )
    t3 = time.perf_counter()
    for idx, (sig, dec) in enumerate(zip(signals, back)):
        if not np.array_equal(dec, sig):
            raise AssertionError(f"{name} [tpu]: lossless check failed read {idx}")
    press = sum(len(s) for s in streams)
    print(
        f"{name}\t{bound:.1f}\t{press:.1f}\t{raw / press:.6f}\t{raw:.1f}\t"
        f"{t1 - t0:.6f}\t{t2 - t1:.6f}\t{t3 - t2:.6f}",
        file=out,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("file")
    ap.add_argument("--methods", default=None)
    ap.add_argument("--per-read", action="store_true")
    ap.add_argument("--list", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args(argv)
    if args.list:
        print("\n".join(registry.names()))
        return 0
    signals = [r.signal for r in read_blow5(args.file).reads]
    if args.tpu:
        from honours_tpu.engine import runner

        methods = (
            args.methods.split(",") if args.methods
            else runner.engine_codec_names()
        )
        print(HDR)
        for m in methods:
            run_method_tpu(m, signals)
        return 0
    methods = args.methods.split(",") if args.methods else DEFAULT_METHODS
    if args.per_read:
        print("read\t" + HDR)
    else:
        print(HDR)
    for m in methods:
        run_method(registry.get(m), signals, per_read=args.per_read)
    return 0


if __name__ == "__main__":
    sys.exit(main())
