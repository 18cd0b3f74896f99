#!/usr/bin/env python3
"""Benchmark driver: VBZ-class pipeline on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measured quantity: encode+decode throughput of the svb16-zd (VBZ
container) batched TPU engine on fixture-derived signal, GB/s per chip,
total bytes / (t_enc + t_dec).  Baseline: the reference's single-core
zstd-svb-zd encode+decode on the NA12878 corpus
(BASELINE.md: 113.471 GB x2 / (388.1 s + 381.8 s) = 0.295 GB/s).

Also reported (extra fields): srans flagship throughput and the
compressed ratios of the VBZ-equivalent (zstd over the TPU svb16-zd
stream) and srans_vbbe21_zd on the same data.
"""

from __future__ import annotations

import json
import signal
import sys
import time

import numpy as np

BASELINE_VBZ_ENC_DEC_GBPS = 2 * 113.471 / (388.1 + 381.8)
#: the reference method with comparable ratio to srans (rc01s-vbbe21-zd,
#: ratio 2.9913; BASELINE.md enc 5828.5 s / dec 6640.1 s single-core)
BASELINE_RC01S_ENC_DEC_GBPS = 2 * 113.471 / (5828.5 + 6640.1)

#: hard wall-clock budget; the axon tunnel can wedge indefinitely and a
#: hung bench must still emit its JSON line
BUDGET_S = int(__import__("os").environ.get("HTPU_BENCH_BUDGET_S", "1500"))


class BenchTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise BenchTimeout()

B = 256
L = 1 << 16
REPS = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_batch():
    """B chunks of length L tiled from the fixture reads.

    The fixture holds ~250 KB of unique signal; the batch tiles it to
    fill [B, L].  Throughput numbers are unaffected by the tiling;
    RATIOS are therefore reported over one unique pass only (see
    unique_chunks below) and the JSON discloses corpus_unique_bytes.
    """
    from honours_tpu.io.blow5 import read_signals

    reads = read_signals("tests/data/three-reads.blow5")
    chunks = []
    for s in reads:
        for i in range(0, s.size - L + 1, L):
            chunks.append(s[i : i + L])
    n_unique = len(chunks)
    while len(chunks) < B:
        chunks = chunks + chunks
    return np.stack(chunks[:B]), n_unique


_RTT = None


def measure_rtt():
    """One-way sync cost of the axon tunnel (fetching a ready scalar).

    block_until_ready does not actually block over the tunnel, so timing
    must always end in a value fetch; that fetch costs ~60 ms of RTT
    which would otherwise swamp millisecond kernels.
    """
    global _RTT
    import jax.numpy as jnp

    x = jnp.zeros((), jnp.float32) + 1
    float(x)
    t0 = time.time()
    n = 5
    for _ in range(n):
        float(x + 1)
    _RTT = (time.time() - t0) / n
    log(f"tunnel RTT ~= {_RTT * 1e3:.1f} ms")


def timed(fn, sync, reps=REPS):
    """fn() must RETURN its device result without fetching; dispatches are
    queued async and a single scalar fetch at the end syncs the queue."""
    import jax.numpy as jnp

    r = fn()  # warm (compile)
    float(jnp.sum(jnp.ravel(r)[:1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    float(jnp.sum(jnp.ravel(r)[:1].astype(jnp.float32)))
    return max((time.time() - t0 - (_RTT or 0.0)) / reps, 1e-9)


_T0 = time.time()


def main():
    import jax
    import jax.numpy as jnp

    from honours_tpu.engine.pipeline import (
        canned_rans_tables,
        depress_srans_batch,
        press_srans_batch,
    )
    from honours_tpu.engine.svb16 import svb16_decode_batch, svb16_encode_batch

    log("devices:", jax.devices())
    measure_rtt()
    base, n_unique = build_batch()
    nbytes = base.size * 2
    unique_bytes = n_unique * L * 2
    sig = jnp.asarray(base)
    n = jnp.full((B,), L, jnp.int32)

    def sync():
        # cheap full sync: fetch a scalar derived from a fresh computation
        float(jnp.sum(n))

    # ---- VBZ container on TPU ----
    log("compiling svb16 engines...")
    stream, out_len = svb16_encode_batch(sig, n, zd=True)
    dec = svb16_decode_batch(stream, n, L, zd=True)
    ok = bool(jnp.all(dec == sig))
    comp_svb = int(jnp.sum(out_len))

    t_enc = timed(lambda: svb16_encode_batch(sig, n, zd=True)[1], sync)
    t_dec = timed(lambda: svb16_decode_batch(stream, n, L, zd=True), sync)
    gbps = 2 * nbytes / (t_enc + t_dec) / 1e9
    log(
        f"svb16-zd TPU: enc {nbytes / t_enc / 1e9:.2f} GB/s, "
        f"dec {nbytes / t_dec / 1e9:.2f} GB/s, lossless={ok}"
    )

    # VBZ = zstd over the svb16 stream (host stage, level 1 like the ref)
    import zstandard

    cctx = zstandard.ZstdCompressor(level=1)
    stream_np = np.asarray(stream)
    lens_np = np.asarray(out_len)
    t0 = time.time()
    vbz_bytes = sum(
        len(cctx.compress(stream_np[i, : lens_np[i]].tobytes())) + 4
        for i in range(n_unique)
    )
    t_zstd = time.time() - t0
    vbz_ratio = unique_bytes / vbz_bytes
    log(f"VBZ (zstd over svb16-zd): ratio {vbz_ratio:.4f}, host zstd {t_zstd:.2f}s")

    # ---- srans flagship ----
    log("compiling srans pipeline...")
    freqs, cum = canned_rans_tables()
    EMAX = L // 16  # ~6% exception budget; lossless assert below verifies
    s2, l2 = press_srans_batch(sig, n, freqs, cum, EMAX)
    srans_ratio = unique_bytes / int(jnp.sum(l2[:n_unique]))
    d2 = depress_srans_batch(s2, n, freqs, cum, L, emax=EMAX)
    srans_ok = bool(jnp.all(d2 == sig))
    t_enc2 = timed(lambda: press_srans_batch(sig, n, freqs, cum, EMAX)[1], sync)
    t_dec2 = timed(
        lambda: depress_srans_batch(s2, n, freqs, cum, L, emax=EMAX), sync
    )
    srans_gbps = 2 * nbytes / (t_enc2 + t_dec2) / 1e9
    log(
        f"srans: enc {nbytes / t_enc2 / 1e9:.2f} GB/s, dec "
        f"{nbytes / t_dec2 / 1e9:.2f} GB/s, ratio {srans_ratio:.4f}, "
        f"lossless={srans_ok}"
    )

    # ---- srans2 flagship (order-1) ----
    log("compiling srans2 pipeline...")
    from honours_tpu.engine.pipeline import (
        canned_o1_device_tables,
        depress_srans2_batch,
        press_srans2_batch,
    )

    tabs = canned_o1_device_tables()
    s3, l3 = press_srans2_batch(sig, n, tabs, EMAX)
    srans2_ratio = unique_bytes / int(jnp.sum(l3[:n_unique]))
    d3 = depress_srans2_batch(s3, n, tabs, L, emax=EMAX)
    srans2_ok = bool(jnp.all(d3 == sig))
    # encode byte-parity with the host codec on one unique row
    from honours_tpu.codecs.base import get as get_codec

    host = get_codec("srans2_vbbe21_zd").press(base[0])
    parity = np.asarray(s3[0, : int(l3[0])]).tobytes() == host
    t_enc3 = timed(lambda: press_srans2_batch(sig, n, tabs, EMAX)[1], sync)
    t_dec3 = timed(lambda: depress_srans2_batch(s3, n, tabs, L, emax=EMAX), sync)
    srans2_gbps = 2 * nbytes / (t_enc3 + t_dec3) / 1e9
    log(
        f"srans2: enc {nbytes / t_enc3 / 1e9:.2f} GB/s, dec "
        f"{nbytes / t_dec3 / 1e9:.2f} GB/s, ratio {srans2_ratio:.4f}, "
        f"lossless={srans2_ok}, host-parity={parity}"
    )

    # ---- srans3 (nibble-factorized order-1, format v4) ----
    # budget-aware: srans3 is an alternative format, not the headline —
    # skip it rather than risk the watchdog if compiles ran long
    srans3_fields = {}
    if time.time() - _T0 < BUDGET_S * 0.55:
        log("compiling srans3 pipeline...")
        from honours_tpu.engine.pipeline import (
            canned_o1n_device_tables,
            depress_srans3_batch,
            press_srans3_batch,
        )

        tabs3 = canned_o1n_device_tables()
        s4, l4 = press_srans3_batch(sig, n, tabs3, EMAX)
        srans3_ratio = unique_bytes / int(jnp.sum(l4[:n_unique]))
        d4 = depress_srans3_batch(s4, n, tabs3, L, emax=EMAX)
        srans3_ok = bool(jnp.all(d4 == sig))
        host3 = get_codec("srans3_vbbe21_zd").press(base[0])
        parity3 = np.asarray(s4[0, : int(l4[0])]).tobytes() == host3
        t_enc4 = timed(lambda: press_srans3_batch(sig, n, tabs3, EMAX)[1], sync)
        t_dec4 = timed(
            lambda: depress_srans3_batch(s4, n, tabs3, L, emax=EMAX), sync
        )
        srans3_gbps = 2 * nbytes / (t_enc4 + t_dec4) / 1e9
        log(
            f"srans3: enc {nbytes / t_enc4 / 1e9:.2f} GB/s, dec "
            f"{nbytes / t_dec4 / 1e9:.2f} GB/s, ratio {srans3_ratio:.4f}, "
            f"lossless={srans3_ok}, host-parity={parity3}"
        )
        srans3_fields = {
            "srans3_enc_GBps": round(nbytes / t_enc4 / 1e9, 4),
            "srans3_dec_GBps": round(nbytes / t_dec4 / 1e9, 4),
            "srans3_ratio": round(srans3_ratio, 4),
            "srans3_lossless": srans3_ok,
            "srans3_host_parity": parity3,
            "srans3_vs_rc01s_throughput": round(
                srans3_gbps / BASELINE_RC01S_ENC_DEC_GBPS, 1
            ),
        }
    else:
        log("skipping srans3 section (bench budget)")

    # ---- held-out ratio protocol: o1 table trained on read 0 ONLY,
    # scored on the batch (whose unique chunks come from reads 1-2 —
    # read 0 is too short to contribute a 64Ki chunk), so every scored
    # byte is unseen at training time.
    log("held-out protocol (train read 0, score reads 1-2)...")
    from honours_tpu.engine.entropy_o1 import make_o1_tables
    from honours_tpu.tables.o1 import heldout_o1_freqs

    ho_tabs = make_o1_tables(heldout_o1_freqs())
    s_ho, l_ho = press_srans2_batch(sig, n, ho_tabs, EMAX)
    d_ho = depress_srans2_batch(s_ho, n, ho_tabs, L, emax=EMAX)
    ho_ok = bool(jnp.all(d_ho == sig))
    heldout_ratio = unique_bytes / int(jnp.sum(l_ho[:n_unique]))
    log(
        f"held-out: srans2 {heldout_ratio:.4f} (in-sample {srans2_ratio:.4f},"
        f" vbz on same data {vbz_ratio:.4f}), lossless={ho_ok}"
    )

    # ---- synthetic transfer corpus (>=100 MB the canned tables never saw)
    log("synthetic transfer corpus...")
    from honours_tpu.analysis import synthesize_corpus

    synth_batches = 3  # 3 x [256, 64Ki] int16 = 100.7 MB
    synth_comp = synth_vbz = 0
    synth_raw = synth_batches * B * L * 2
    for bi in range(synth_batches):
        sb = synthesize_corpus(B * L, seed=100 + bi).reshape(B, L)
        sbj = jnp.asarray(sb)
        _, l_s = press_srans2_batch(sbj, n, tabs, EMAX)
        d_s = depress_srans2_batch(
            press_srans2_batch(sbj, n, tabs, EMAX)[0], n, tabs, L, emax=EMAX
        )
        assert bool(jnp.all(d_s == sbj)), "synthetic round trip failed"
        synth_comp += int(jnp.sum(l_s))
        st_s, ol_s = svb16_encode_batch(sbj, n, zd=True)
        st_np, ol_np = np.asarray(st_s), np.asarray(ol_s)
        synth_vbz += sum(
            len(cctx.compress(st_np[i, : ol_np[i]].tobytes())) + 4
            for i in range(B)
        )
    log(
        f"synthetic ({synth_raw / 1e6:.0f} MB): srans2 "
        f"{synth_raw / synth_comp:.4f}, vbz {synth_raw / synth_vbz:.4f}"
    )

    print(
        json.dumps(
            {
                "metric": "vbz_svb16zd_enc_dec_GBps_per_chip",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_VBZ_ENC_DEC_GBPS, 2),
                "extra": {
                    "svb16_enc_GBps": round(nbytes / t_enc / 1e9, 4),
                    "svb16_dec_GBps": round(nbytes / t_dec / 1e9, 4),
                    "svb16_lossless": ok,
                    "vbz_ratio": round(vbz_ratio, 4),
                    "srans_enc_GBps": round(nbytes / t_enc2 / 1e9, 4),
                    "srans_dec_GBps": round(nbytes / t_dec2 / 1e9, 4),
                    "srans_ratio": round(srans_ratio, 4),
                    "srans_lossless": srans_ok,
                    "srans_vs_rc01s_throughput": round(
                        srans_gbps / BASELINE_RC01S_ENC_DEC_GBPS, 1
                    ),
                    "srans2_enc_GBps": round(nbytes / t_enc3 / 1e9, 4),
                    "srans2_dec_GBps": round(nbytes / t_dec3 / 1e9, 4),
                    "srans2_ratio": round(srans2_ratio, 4),
                    "srans2_lossless": srans2_ok,
                    "srans2_host_parity": parity,
                    "srans2_vs_rc01s_throughput": round(
                        srans2_gbps / BASELINE_RC01S_ENC_DEC_GBPS, 1
                    ),
                    **srans3_fields,
                    "ref_vbz_ratio": 2.9284,
                    "ref_rc01s_ratio": 2.9913,
                    "ref_dstall_ratio": 2.9917,
                    "batch": [B, L],
                    "corpus_unique_bytes": unique_bytes,
                    "ratio_basis": "unique fixture chunks only",
                    "heldout_ratio_srans2": round(heldout_ratio, 4),
                    "heldout_lossless": ho_ok,
                    "heldout_protocol": "o1 table trained on read 0 only; "
                    "scored chunks all come from reads 1-2",
                    "synth_raw_bytes": synth_raw,
                    "synth_srans2_ratio": round(synth_raw / synth_comp, 4),
                    "synth_vbz_ratio": round(synth_raw / synth_vbz, 4),
                },
            }
        )
    )


if __name__ == "__main__":
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(BUDGET_S)
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the JSON line must emit
        import traceback

        kind = "timeout: TPU unreachable" if isinstance(
            e, BenchTimeout
        ) else f"{type(e).__name__}: {e}"
        log("bench failed — emitting sentinel:", kind)
        traceback.print_exc()
        print(
            json.dumps(
                {
                    "metric": "vbz_svb16zd_enc_dec_GBps_per_chip",
                    "value": 0.0,
                    "unit": "GB/s",
                    "vs_baseline": 0.0,
                    "extra": {"error": kind[:500]},
                }
            )
        )
        # the wedged jax call may never unwind past the exception; force exit
        import os

        os._exit(0 if isinstance(e, BenchTimeout) else 1)
