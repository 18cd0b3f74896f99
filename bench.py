#!/usr/bin/env python3
"""Benchmark driver: VBZ-class pipeline on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Measured quantity: encode+decode throughput of the svb16-zd (VBZ
container) batched TPU engine on fixture-derived signal, GB/s per chip,
total bytes / (t_enc + t_dec).  Baseline: the reference's single-core
zstd-svb-zd encode+decode on the NA12878 corpus
(BASELINE.md: 113.471 GB x2 / (388.1 s + 381.8 s) = 0.295 GB/s).

Section order puts every DEFAULT flagship (svb16, srans2, dstall,
drans) before optional extras, and any section skipped for budget or
error is recorded in extra["skipped"] — no silent holes (VERDICT r3
item 4).  A persistent XLA compilation cache keeps reruns cheap.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time
import traceback

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

BASELINE_VBZ_ENC_DEC_GBPS = 2 * 113.471 / (388.1 + 381.8)
#: the reference method with comparable ratio to srans (rc01s-vbbe21-zd,
#: ratio 2.9913; BASELINE.md enc 5828.5 s / dec 6640.1 s single-core)
BASELINE_RC01S_ENC_DEC_GBPS = 2 * 113.471 / (5828.5 + 6640.1)

#: hard wall-clock budget; the axon tunnel can wedge indefinitely and a
#: hung bench must still emit its JSON line
BUDGET_S = int(os.environ.get("HTPU_BENCH_BUDGET_S", "2100"))


class BenchTimeout(Exception):
    pass


def _alarm(_sig, _frm):
    raise BenchTimeout()


B = 256
L = 1 << 16
REPS = 10
EMAX = L // 16  # ~6% exception budget; lossless asserts verify per run

_T0 = time.time()
_SKIPPED: list = []
_EXTRA: dict = {}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def budget_left():
    return BUDGET_S - (time.time() - _T0)


def section(name, min_budget_s, fn):
    """Run one bench section; record a skip reason instead of dying."""
    if budget_left() < min_budget_s:
        _SKIPPED.append({"section": name, "reason": "budget"})
        log(f"skipping {name} (budget: {budget_left():.0f}s left, "
            f"needs ~{min_budget_s}s)")
        return
    log(f"[{name}] (budget left {budget_left():.0f}s)")
    try:
        fn()
    except BenchTimeout:
        raise
    except Exception as e:  # noqa: BLE001 — record and continue
        _SKIPPED.append({"section": name, "reason": f"{type(e).__name__}: {e}"[:200]})
        log(f"section {name} FAILED:")
        traceback.print_exc()


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


def timed(fn, reps=REPS):
    """fn() must RETURN its device result without fetching; dispatches are
    queued async and a single scalar fetch at the end syncs the queue."""
    import jax
    import jax.numpy as jnp

    r = fn()  # warm (compile)
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    float(jnp.sum(jnp.ravel(jax.tree.leaves(r)[0])[:1].astype(jnp.float32)))
    return max((time.time() - t0 - (_RTT or 0.0)) / reps, 1e-9)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from honours_tpu.engine.svb16 import svb16_decode_batch, svb16_encode_batch

    log("devices:", jax.devices())
    measure_rtt()
    base, n_unique = build_batch()
    nbytes = base.size * 2
    unique_bytes = n_unique * L * 2
    sig = jnp.asarray(base)
    n = jnp.full((B,), L, jnp.int32)

    state: dict = {}

    # ---- 1. VBZ container on TPU (fused kernels; the headline) ----
    def sec_svb16():
        stream, out_len = svb16_encode_batch(sig, n, zd=True)
        dec = svb16_decode_batch(stream, n, L, zd=True)
        ok = bool(jnp.all(dec == sig))
        t_enc = timed(lambda: svb16_encode_batch(sig, n, zd=True)[1])
        t_dec = timed(lambda: svb16_decode_batch(stream, n, L, zd=True))
        gbps = 2 * nbytes / (t_enc + t_dec) / 1e9
        log(f"svb16-zd TPU: enc {nbytes / t_enc / 1e9:.2f} GB/s, "
            f"dec {nbytes / t_dec / 1e9:.2f} GB/s, lossless={ok}")
        state.update(svb_stream=stream, svb_len=out_len, gbps=gbps)
        _EXTRA.update(
            svb16_enc_GBps=round(nbytes / t_enc / 1e9, 4),
            svb16_dec_GBps=round(nbytes / t_dec / 1e9, 4),
            svb16_lossless=ok,
        )

    # ---- 2. VBZ ratio (host zstd over the svb16 stream, level 1) ----
    def sec_vbz():
        import zstandard

        cctx = zstandard.ZstdCompressor(level=1)
        stream_np = np.asarray(state["svb_stream"])
        lens_np = np.asarray(state["svb_len"])
        t0 = time.time()
        vbz_bytes = sum(
            len(cctx.compress(stream_np[i, : lens_np[i]].tobytes())) + 4
            for i in range(n_unique)
        )
        state["vbz_ratio"] = unique_bytes / vbz_bytes
        state["cctx"] = cctx
        log(f"VBZ (zstd over svb16-zd): ratio {state['vbz_ratio']:.4f}, "
            f"host zstd {time.time() - t0:.2f}s")
        _EXTRA.update(vbz_ratio=round(state["vbz_ratio"], 4))

    # ---- 3. srans2 flagship (order-1) ----
    def sec_srans2():
        from honours_tpu.codecs.base import get as get_codec
        from honours_tpu.engine.pipeline import (
            canned_o1_device_tables,
            depress_srans2_batch,
            press_srans2_batch,
        )

        tabs = canned_o1_device_tables()
        s3, l3 = press_srans2_batch(sig, n, tabs, EMAX)
        ratio = unique_bytes / int(jnp.sum(l3[:n_unique]))
        d3 = depress_srans2_batch(s3, n, tabs, L, emax=EMAX)
        ok = bool(jnp.all(d3 == sig))
        host = get_codec("srans2_vbbe21_zd").press(base[0])
        parity = np.asarray(s3[0, : int(l3[0])]).tobytes() == host
        t_enc = timed(lambda: press_srans2_batch(sig, n, tabs, EMAX)[1])
        t_dec = timed(lambda: depress_srans2_batch(s3, n, tabs, L, emax=EMAX))
        gbps = 2 * nbytes / (t_enc + t_dec) / 1e9
        log(f"srans2: enc {nbytes / t_enc / 1e9:.2f} GB/s, dec "
            f"{nbytes / t_dec / 1e9:.2f} GB/s, ratio {ratio:.4f}, "
            f"lossless={ok}, host-parity={parity}")
        state.update(o1_tabs=tabs, srans2_ratio=ratio)
        _EXTRA.update(
            srans2_enc_GBps=round(nbytes / t_enc / 1e9, 4),
            srans2_dec_GBps=round(nbytes / t_dec / 1e9, 4),
            srans2_ratio=round(ratio, 4),
            srans2_lossless=ok,
            srans2_host_parity=bool(parity),
            srans2_vs_rc01s_throughput=round(
                gbps / BASELINE_RC01S_ENC_DEC_GBPS, 1),
        )

    # ---- 4. dstall_srans2 (stall-aware flagship; VERDICT r3 item 7) ----
    def sec_dstall():
        from honours_tpu.engine.dstall import (
            depress_dstall_batch,
            press_dstall_batch,
        )
        from honours_tpu.engine.pipeline import canned_o1_device_tables

        tabs = state.get("o1_tabs")
        if tabs is None:
            tabs = state["o1_tabs"] = canned_o1_device_tables()
        s4, l4 = press_dstall_batch(sig, n, tabs, EMAX)
        ratio = unique_bytes / int(jnp.sum(l4[:n_unique]))
        d4 = depress_dstall_batch(s4, n, tabs, L, emax=EMAX)
        ok = bool(jnp.all(d4 == sig))
        t_enc = timed(lambda: press_dstall_batch(sig, n, tabs, EMAX)[1],
                      reps=4)
        t_dec = timed(lambda: depress_dstall_batch(s4, n, tabs, L, emax=EMAX),
                      reps=4)
        log(f"dstall: enc {nbytes / t_enc / 1e9:.2f} GB/s, dec "
            f"{nbytes / t_dec / 1e9:.2f} GB/s, ratio {ratio:.4f}, "
            f"lossless={ok}")
        _EXTRA.update(
            dstall_enc_GBps=round(nbytes / t_enc / 1e9, 4),
            dstall_dec_GBps=round(nbytes / t_dec / 1e9, 4),
            dstall_ratio=round(ratio, 4),
            dstall_lossless=ok,
        )

    # ---- 5. drans (self-contained table; no train/test caveat) ----
    def sec_drans():
        from honours_tpu.codecs.drans import drans_press_reads
        from honours_tpu.engine.drans import (
            depress_drans_batch,
            press_drans_batch,
        )

        from honours_tpu.engine.pipeline import canned_o1_device_tables

        tabs = state.get("o1_tabs")
        if tabs is None:
            tabs = state["o1_tabs"] = canned_o1_device_tables()
        s5, l5 = press_drans_batch(sig, n, tabs, EMAX)
        d5 = depress_drans_batch(s5, n, tabs, L, emax=EMAX)
        ok = bool(jnp.all(d5 == sig))
        # RATIO comes from the unique-chunk batch: tiling the fixture
        # x85 duplicates the fit counts, which (honestly) degrades the
        # prefix-fitted model on this corpus — a real file holds each
        # chunk once, so the unique batch is the representative corpus.
        # Dummy 1-sample rows pad B to 8 for the Pallas walk branch and
        # contribute nothing to the shared fit.
        small = [base[i] for i in range(n_unique)]
        hosts = drans_press_reads(small)
        from honours_tpu.engine.pipeline import pad_batch

        sj, nj = pad_batch(
            small + [np.zeros(1, np.int16)] * (8 - n_unique), L
        )
        se, le = press_drans_batch(sj, nj, tabs, EMAX)
        parity = all(
            np.asarray(se[i, : int(le[i])]).tobytes() == hosts[i]
            for i in range(len(small))
        )
        du = depress_drans_batch(se, nj, tabs, L, emax=EMAX)
        ok = ok and bool(jnp.all(du == sj))
        ratio = unique_bytes / int(jnp.sum(le[:n_unique]))
        t_enc = timed(lambda: press_drans_batch(sig, n, tabs, EMAX)[1],
                      reps=4)
        t_dec = timed(lambda: depress_drans_batch(s5, n, tabs, L, emax=EMAX),
                      reps=4)
        log(f"drans: enc {nbytes / t_enc / 1e9:.2f} GB/s, dec "
            f"{nbytes / t_dec / 1e9:.2f} GB/s, ratio {ratio:.4f} "
            f"(self-contained), lossless={ok}, host-parity={parity}")
        _EXTRA.update(
            drans_enc_GBps=round(nbytes / t_enc / 1e9, 4),
            drans_dec_GBps=round(nbytes / t_dec / 1e9, 4),
            drans_ratio=round(ratio, 4),
            drans_ratio_tiled=round(
                unique_bytes / int(jnp.sum(l5[:n_unique])), 4
            ),
            drans_lossless=ok,
            drans_host_parity=bool(parity),
            drans_protocol="model fitted from the stream's own prefix by "
            "both encoder and decoder; zero table bytes; no training "
            "data; ratio measured on the unique-chunk batch (tiled-batch "
            "fit disclosed as drans_ratio_tiled)",
        )

    # ---- 6. srans (order-0) ----
    def sec_srans():
        from honours_tpu.engine.pipeline import (
            canned_rans_tables,
            depress_srans_batch,
            press_srans_batch,
        )

        freqs, cum = canned_rans_tables()
        s2, l2 = press_srans_batch(sig, n, freqs, cum, EMAX)
        ratio = unique_bytes / int(jnp.sum(l2[:n_unique]))
        d2 = depress_srans_batch(s2, n, freqs, cum, L, emax=EMAX)
        ok = bool(jnp.all(d2 == sig))
        t_enc = timed(lambda: press_srans_batch(sig, n, freqs, cum, EMAX)[1])
        t_dec = timed(lambda: depress_srans_batch(s2, n, freqs, cum, L,
                                                  emax=EMAX))
        gbps = 2 * nbytes / (t_enc + t_dec) / 1e9
        log(f"srans: enc {nbytes / t_enc / 1e9:.2f} GB/s, dec "
            f"{nbytes / t_dec / 1e9:.2f} GB/s, ratio {ratio:.4f}, "
            f"lossless={ok}")
        _EXTRA.update(
            srans_enc_GBps=round(nbytes / t_enc / 1e9, 4),
            srans_dec_GBps=round(nbytes / t_dec / 1e9, 4),
            srans_ratio=round(ratio, 4),
            srans_lossless=ok,
            srans_vs_rc01s_throughput=round(
                gbps / BASELINE_RC01S_ENC_DEC_GBPS, 1),
        )

    # ---- 7. srans3 (nibble order-1) ----
    def sec_srans3():
        from honours_tpu.codecs.base import get as get_codec
        from honours_tpu.engine.pipeline import (
            canned_o1n_device_tables,
            depress_srans3_batch,
            press_srans3_batch,
        )

        tabs3 = canned_o1n_device_tables()
        s4, l4 = press_srans3_batch(sig, n, tabs3, EMAX)
        ratio = unique_bytes / int(jnp.sum(l4[:n_unique]))
        d4 = depress_srans3_batch(s4, n, tabs3, L, emax=EMAX)
        ok = bool(jnp.all(d4 == sig))
        host3 = get_codec("srans3_vbbe21_zd").press(base[0])
        parity3 = np.asarray(s4[0, : int(l4[0])]).tobytes() == host3
        t_enc = timed(lambda: press_srans3_batch(sig, n, tabs3, EMAX)[1],
                      reps=4)
        t_dec = timed(lambda: depress_srans3_batch(s4, n, tabs3, L,
                                                   emax=EMAX), reps=4)
        gbps = 2 * nbytes / (t_enc + t_dec) / 1e9
        log(f"srans3: enc {nbytes / t_enc / 1e9:.2f} GB/s, dec "
            f"{nbytes / t_dec / 1e9:.2f} GB/s, ratio {ratio:.4f}, "
            f"lossless={ok}, host-parity={parity3}")
        _EXTRA.update(
            srans3_enc_GBps=round(nbytes / t_enc / 1e9, 4),
            srans3_dec_GBps=round(nbytes / t_dec / 1e9, 4),
            srans3_ratio=round(ratio, 4),
            srans3_lossless=ok,
            srans3_host_parity=bool(parity3),
            srans3_vs_rc01s_throughput=round(
                gbps / BASELINE_RC01S_ENC_DEC_GBPS, 1),
        )

    # ---- 8. held-out ratio protocol (canned-table disclosure) ----
    def sec_heldout():
        from honours_tpu.engine.entropy_o1 import make_o1_tables
        from honours_tpu.engine.pipeline import (
            depress_srans2_batch,
            press_srans2_batch,
        )
        from honours_tpu.tables.o1 import heldout_o1_freqs

        ho_tabs = make_o1_tables(heldout_o1_freqs())
        s_ho, l_ho = press_srans2_batch(sig, n, ho_tabs, EMAX)
        d_ho = depress_srans2_batch(s_ho, n, ho_tabs, L, emax=EMAX)
        ho_ok = bool(jnp.all(d_ho == sig))
        heldout_ratio = unique_bytes / int(jnp.sum(l_ho[:n_unique]))
        log(f"held-out: srans2 {heldout_ratio:.4f} (in-sample "
            f"{state.get('srans2_ratio', 0):.4f}, vbz on same data "
            f"{state.get('vbz_ratio', 0):.4f}), lossless={ho_ok}")
        _EXTRA.update(
            heldout_ratio_srans2=round(heldout_ratio, 4),
            heldout_lossless=ho_ok,
            heldout_protocol="o1 table trained on read 0 only; scored "
            "chunks all come from reads 1-2 (drans needs no such split)",
        )

    # ---- 9. synthetic transfer corpus (>=100 MB unseen) ----
    def sec_synth():
        from honours_tpu.analysis import synthesize_corpus
        from honours_tpu.engine.drans import (
            depress_drans_batch,
            press_drans_batch,
        )
        from honours_tpu.engine.pipeline import (
            depress_srans2_batch,
            press_srans2_batch,
        )

        from honours_tpu.engine.pipeline import canned_o1_device_tables

        import zstandard

        tabs = state.get("o1_tabs")
        if tabs is None:
            tabs = state["o1_tabs"] = canned_o1_device_tables()
        # local compressor: this section must not depend on the vbz_ratio
        # section having run (ADVICE r4 item 1)
        cctx = zstandard.ZstdCompressor(level=1)
        # scale the evidence to the budget (VERDICT r4 item 7): at least
        # 3 batches (100.7 MB), up to 30 (1.01 GB) of unseen synthetic
        # signal, with per-batch ratio dispersion so the flagship margins
        # carry statistical weight
        max_batches = int(os.environ.get("HTPU_SYNTH_BATCHES", "30"))
        batch_raw = B * L * 2
        synth_comp = synth_vbz = synth_drans = 0
        r_srans2, r_drans, r_vbz = [], [], []
        bi = 0
        t_start = time.time()
        while bi < max_batches:
            # reserve the cold-compile cost of the dstall_drans section
            # that runs after this one (~4 fresh jits, ~400 s on the
            # axon server) plus one more batch + the JSON epilogue
            if bi >= 3 and budget_left() < (
                1.5 * (time.time() - t_start) / bi + 480
            ):
                break
            sb = synthesize_corpus(B * L, seed=100 + bi).reshape(B, L)
            sbj = jnp.asarray(sb)
            s_s, l_s = press_srans2_batch(sbj, n, tabs, EMAX)
            d_s = depress_srans2_batch(s_s, n, tabs, L, emax=EMAX)
            assert bool(jnp.all(d_s == sbj)), "synthetic round trip failed"
            c = int(jnp.sum(l_s)); synth_comp += c
            r_srans2.append(batch_raw / c)
            s_d, l_d = press_drans_batch(sbj, n, tabs, EMAX)
            d_d = depress_drans_batch(s_d, n, tabs, L, emax=EMAX)
            assert bool(jnp.all(d_d == sbj)), "synthetic drans failed"
            c = int(jnp.sum(l_d)); synth_drans += c
            r_drans.append(batch_raw / c)
            st_s, ol_s = svb16_encode_batch(sbj, n, zd=True)
            st_np, ol_np = np.asarray(st_s), np.asarray(ol_s)
            c = sum(
                len(cctx.compress(st_np[i, : ol_np[i]].tobytes())) + 4
                for i in range(B)
            )
            synth_vbz += c
            r_vbz.append(batch_raw / c)
            bi += 1
        synth_raw = bi * batch_raw

        def disp(rs):
            a = np.asarray(rs)
            return dict(mean=round(float(a.mean()), 4),
                        std=round(float(a.std()), 4),
                        min=round(float(a.min()), 4),
                        max=round(float(a.max()), 4))

        log(f"synthetic ({synth_raw / 1e6:.0f} MB, {bi} batches): srans2 "
            f"{synth_raw / synth_comp:.4f}, drans "
            f"{synth_raw / synth_drans:.4f}, vbz {synth_raw / synth_vbz:.4f}"
            f" (per-batch drans spread {disp(r_drans)})")
        _EXTRA.update(
            synth_raw_bytes=synth_raw,
            synth_batches=bi,
            synth_srans2_ratio=round(synth_raw / synth_comp, 4),
            synth_drans_ratio=round(synth_raw / synth_drans, 4),
            synth_vbz_ratio=round(synth_raw / synth_vbz, 4),
            synth_srans2_dispersion=disp(r_srans2),
            synth_drans_dispersion=disp(r_drans),
            synth_vbz_dispersion=disp(r_vbz),
        )

    # ---- 10. dstall_drans (stall-aware self-contained flagship) ----
    def sec_dstall_drans():
        from honours_tpu.codecs.dstall_drans import dstall_drans_press_reads
        from honours_tpu.engine.dstall_drans import (
            depress_dstall_drans_batch,
            press_dstall_drans_batch,
        )
        from honours_tpu.engine.pipeline import (
            canned_o1_device_tables,
            pad_batch,
        )

        tabs = state.get("o1_tabs")
        if tabs is None:
            tabs = state["o1_tabs"] = canned_o1_device_tables()
        s6, l6 = press_dstall_drans_batch(sig, n, tabs, EMAX)
        d6 = depress_dstall_drans_batch(s6, n, tabs, L, emax=EMAX)
        ok = bool(jnp.all(d6 == sig))
        # ratio + parity on the unique-chunk batch (same protocol and
        # honesty note as sec_drans)
        small = [base[i] for i in range(n_unique)]
        hosts = dstall_drans_press_reads(small)
        sj, nj = pad_batch(
            small + [np.zeros(1, np.int16)] * (8 - n_unique), L
        )
        se, le = press_dstall_drans_batch(sj, nj, tabs, EMAX)
        parity = all(
            np.asarray(se[i, : int(le[i])]).tobytes() == hosts[i]
            for i in range(len(small))
        )
        du = depress_dstall_drans_batch(se, nj, tabs, L, emax=EMAX)
        ok = ok and bool(jnp.all(du == sj))
        ratio = unique_bytes / int(jnp.sum(le[:n_unique]))
        t_enc = timed(lambda: press_dstall_drans_batch(sig, n, tabs, EMAX)[1],
                      reps=2)
        t_dec = timed(
            lambda: depress_dstall_drans_batch(s6, n, tabs, L, emax=EMAX),
            reps=2,
        )
        log(f"dstall_drans: enc {nbytes / t_enc / 1e9:.2f} GB/s, dec "
            f"{nbytes / t_dec / 1e9:.2f} GB/s, ratio {ratio:.4f} "
            f"(self-contained, stall-aware), lossless={ok}, "
            f"host-parity={parity}")
        _EXTRA.update(
            dstall_drans_enc_GBps=round(nbytes / t_enc / 1e9, 4),
            dstall_drans_dec_GBps=round(nbytes / t_dec / 1e9, 4),
            dstall_drans_ratio=round(ratio, 4),
            dstall_drans_lossless=ok,
            dstall_drans_host_parity=bool(parity),
            dstall_drans_protocol="reference dstall-fz min-pick over "
            "self-contained drans branches; measured: the pick chooses "
            "plain on real signal (split never earns back its framing "
            "under a globally fitted model), so ratio tracks drans "
            "minus 5 bytes/read",
        )

    # ordered so every engine codec reports numbers before the optional
    # evidence sections — BENCH skipped=[] is the contract (VERDICT r4
    # item 5); gates are warm-cache section costs
    plan = [
        ("svb16", 120, sec_svb16),
        ("vbz_ratio", 30, sec_vbz),
        ("srans2", 180, sec_srans2),
        ("drans", 180, sec_drans),
        ("srans", 100, sec_srans),
        ("srans3", 120, sec_srans3),
        ("dstall", 150, sec_dstall),
        ("heldout", 60, sec_heldout),
        ("synthetic", 90, sec_synth),
        # last: its engine path compiles ~4 fresh jits on a cold server
        # cache (~5-8 min) — everything above must have reported first
        ("dstall_drans", 180, sec_dstall_drans),
    ]
    for i, (name, gate, fn) in enumerate(plan):
        try:
            section(name, gate, fn)
        except BenchTimeout:
            # the SIGALRM fired inside this section: ledger it AND every
            # unreached section, then stop — no silent holes
            _SKIPPED.append({"section": name, "reason": "wall-clock alarm"})
            for rest, _, _ in plan[i + 1 :]:
                _SKIPPED.append({"section": rest, "reason": "after alarm"})
            break

    gbps = state.get("gbps", 0.0)
    _EXTRA.update(
        ref_vbz_ratio=2.9284,
        ref_rc01s_ratio=2.9913,
        ref_dstall_ratio=2.9917,
        batch=[B, L],
        corpus_unique_bytes=unique_bytes,
        ratio_basis="unique fixture chunks only",
        skipped=_SKIPPED,
    )
    print(
        json.dumps(
            {
                "metric": "vbz_svb16zd_enc_dec_GBps_per_chip",
                "value": round(gbps, 4),
                "unit": "GB/s",
                "vs_baseline": round(gbps / BASELINE_VBZ_ENC_DEC_GBPS, 2),
                "extra": _EXTRA,
            }
        )
    )


if __name__ == "__main__":
    signal.signal(signal.SIGALRM, _alarm)
    signal.alarm(BUDGET_S)
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the JSON line must emit
        kind = "timeout: TPU unreachable" if isinstance(
            e, BenchTimeout
        ) else f"{type(e).__name__}: {e}"
        log("bench failed — emitting sentinel:", kind)
        traceback.print_exc()
        _EXTRA.update(error=kind[:500], skipped=_SKIPPED)
        # salvage the headline if the svb16 section completed before the
        # failure (partial runs should not read as 0 GB/s)
        gbps = 0.0
        if "svb16_enc_GBps" in _EXTRA and "svb16_dec_GBps" in _EXTRA:
            e_, d_ = _EXTRA["svb16_enc_GBps"], _EXTRA["svb16_dec_GBps"]
            if e_ > 0 and d_ > 0:
                gbps = 2 / (1 / e_ + 1 / d_)
        print(
            json.dumps(
                {
                    "metric": "vbz_svb16zd_enc_dec_GBps_per_chip",
                    "value": round(gbps, 4),
                    "unit": "GB/s",
                    "vs_baseline": round(gbps / BASELINE_VBZ_ENC_DEC_GBPS, 2),
                    "extra": _EXTRA,
                }
            )
        )
        # the wedged jax call may never unwind past the exception; force exit
        os._exit(0 if isinstance(e, BenchTimeout) else 1)
