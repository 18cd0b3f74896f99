"""Pallas TPU kernels for the order-1 rANS engine (wire format v3).

Round-3 redesign around Mosaic's hardware `tpu.dynamic_gather` (exposed
as matching-shape jnp.take_along_axis on a single-vreg source, <=128
lanes — measured ~1 vreg-op per [8,128] gather on v5e):

o1_fc_gather_pallas — ENCODE (f, cum) lookup.  The packed 25-bit
  fc = f + cum*8192 value lives in a [64 clusters x 256 syms] i32 table;
  the kernel scans its 128 single-vreg chunks with predicated gathers
  (~0.4 vreg-ops/element) instead of the round-2 one-hot row-select
  matmul (~49K MACs/element, 38.5 ms on the bench batch).

rans_o1_decode_pallas — the decode walk.  Per step:
  - the context CLUSTER is carried directly (cl = cmap[sym] via a
    2-chunk gather), replacing round 2's 257-wide compare-select,
  - the symbol search splits each cluster's 256-symbol CDF into 4
    quarters: 3 gathered coarse boundaries pick the quarter, ONE
    [RK, 4r] x [4r, 128] bf16 one-hot matmul materializes only that
    quarter's 64 cum_hi values (6-bit planes, bf16-exact), and the
    ge/rank/min/max run 64-wide instead of 256-wide,
  - f and c are DERIVED from the materialized cum row (c = max covered
    cum_hi, f = next cum_hi - c) so no f-planes are stored or fetched,
  - the shared-stream refill fetches both candidate bytes with a
    2-chunk word gather from a register window of the 4-bytes-per-i32
    packed body (4x less VMEM than round 2's byte-expanded body);
    windows reload every 8 steps at 512-byte alignment,
  - output symbols store once per 16-step supergroup (512-lane aligned).

Byte/stream semantics match kernels.rans.rans_{en,de}code_o1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from honours_tpu.kernels.rans import M, PROB_BITS, RANS_L

R = 8     # reads per program (int32 sublane tile)
WW = 256  # window WORDS per read (1 KiB: 511B align slack + 8 steps * 2K)
RB = 8    # lookup block rows
CB = 512  # lookup block cols


def pick_dec_rows(B: int, N: int, Mb: int | None = None) -> int:
    """Largest rows-per-program that divides B and keeps the block's
    VMEM (word-packed body + u8 out + working vregs) inside ~100 MiB of
    v5e's 128 MiB VMEM.  The decode step chain is LATENCY-bound (the
    stripped skeleton runs 17x faster than the full kernel at 32 rows),
    so rows should be as large as memory allows: every extra row
    pipelines more independent work into the per-step dot/VPU chain.

    Round-5 roofline note (tools/chip_dec_ablate.py, [256, 64Ki], real
    chip): at rows=64 the kernel is THROUGHPUT-bound (16/32/64 rows =
    69.4/65.4/62.8 ms) with component costs dot+reconstruct ~15 ms,
    ge/sym search ~9 ms, c/f masked sums ~30 ms, refill+stores ~8 ms —
    ~3.7 ns/symbol, consistent with ~1 vreg-op/cycle VPU issue over the
    [.,256]-wide passes.  Alternatives measured SLOWER or unsupported:
    hierarchical 16x16 search via chunk gathers (72.8 ms — predicated
    chunk scans cost ~100 ns each), f32 single-plane dot (63.1),
    packed two-crossing reductions with lane-shift one-hots (70.2),
    per-lane 3D take_along_axis (Mosaic: 2D gathers only).  Decoding a
    256-symbol order-1 CDF costs >= ~5 full-width vector passes per
    symbol on this VPU; further decode throughput needs a format-level
    change (narrower materialization), not more kernel tuning.

    Round-5 follow-ups, both measured on chip and both losing:
    - c/f via bf16 one-hot MXU dots against static f-planes
      (HTPU_DEC_CF=dots): srans2 dec e2e 84.8 ms vs 74.4 ms masked —
      the per-step dot launches + bf16 casts cost more than the six
      removed f32 passes.
    - the format-level "narrow window" candidate (frequency floor so a
      32-slot window holds <= 2 symbol boundaries) costs >= 10% ratio
      on the canned o1 table (many contexts carry hundreds of tiny
      freqs) — ratio-neutral narrowing does not exist for this model.
    Conclusion stands: ~0.45 GB/s is the roofline of the exact
    256-symbol order-1 format on this VPU generation.

    `Mb` = actual stream width in bytes (the kernel stages the WHOLE
    stream per row, not just ~2N body bytes); returns 0 when even the
    smallest block cannot fit, signalling callers to use the XLA path.
    """
    # rows > 64 explode Mosaic compile time (instruction count scales
    # with vreg count x the 16-step unrolled supergroup) — measured a
    # >20 min compile at rows=256
    Mp = 2 * max(N, 4096) if Mb is None else ((Mb + 511) // 512) * 512 + 8 * WW
    per_row = Mp + 3 * max(N, 4096)
    for rows in (64, 32, 16, 8):
        if B % rows == 0 and rows * per_row <= (88 << 20):
            return rows
    return R if 8 * per_row <= (88 << 20) else 0


def _taa(src_vreg, idx):
    """Single-vreg gather: src [.,128], idx [.,128] -> src[i, idx[i,j]]."""
    return jnp.take_along_axis(src_vreg, jnp.clip(idx, 0, 127), axis=1)


def _gather_chunks(table_2d, idx, n_chunks: int):
    """table_2d [n_chunks, 128] i32, idx [8, 128] in [0, 128*n_chunks) ->
    out [8, 128] = table.flat[idx], via predicated single-vreg gathers."""
    hi = idx >> 7
    lo = idx & 127
    out = jnp.zeros(idx.shape, jnp.int32)
    for j in range(n_chunks):
        chunk = jnp.broadcast_to(table_2d[j : j + 1, :], idx.shape)
        out = jnp.where(hi == j, _taa(chunk, lo), out)
    return out


# ---------------------------------------------------------------------------
# encode lookup
# ---------------------------------------------------------------------------


def _fc_kernel(sym_ref, ctx_ref, cmap_ref, fc_tab_ref, out_ref):
    sym = sym_ref[:, :]  # [RB, CB]
    ctx = ctx_ref[:, :]
    cm = cmap_ref[:, :]          # [3, 128] chunks of cmap[0..256]
    tab = fc_tab_ref[:, :]       # [128, 128] = [64 x 256] fc values
    blocks = []
    for b in range(CB // 128):
        s = sym[:, b * 128 : (b + 1) * 128]
        c = ctx[:, b * 128 : (b + 1) * 128]
        cl = _gather_chunks(cm, c, 3)
        idx = cl * 256 + s
        # NOTE: a per-chunk @pl.when skip (contexts are cluster-skewed)
        # was tried and is ~10x SLOWER — the scalar any-reduce + branch
        # per chunk costs far more than the straight predicated pass
        blocks.append(_gather_chunks(tab, idx, 128))
    out_ref[:, :] = jnp.concatenate(blocks, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def o1_fc_gather_pallas(sym, ctx, cmap_pad, fc_tab, interpret: bool = False):
    """sym [B, G] i32 in [0,256), ctx [B, G] i32 in [0,256] ->
    fc [B, G] i32 = f + cum*8192 exact table lookups."""
    B, G = sym.shape
    Bp = -(-B // RB) * RB
    Gp = -(-G // CB) * CB
    s = jnp.pad(sym, ((0, Bp - B), (0, Gp - G)))
    c_ = jnp.pad(ctx, ((0, Bp - B), (0, Gp - G)))
    fc = pl.pallas_call(
        _fc_kernel,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((Bp, Gp), jnp.int32),
        grid=(Bp // RB, Gp // CB),
        in_specs=[
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (RB, CB), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
    )(s, c_, cmap_pad, fc_tab)
    return fc[:B, :G]


# ---------------------------------------------------------------------------
# decode walk
# ---------------------------------------------------------------------------


#: c/f extraction scheme: "dots" = bf16 one-hot MXU dots against static
#: f-planes; "masked" = r4's full-width f32 masked-sum pair.  Chip A/B
#: via HTPU_DEC_CF; the faster measured scheme is the default.
import os as _os

CF_MODE = _os.environ.get("HTPU_DEC_CF", "masked")


def _decode_kernel(bodyw_ref, states_ref, dlen_ref, sb_ref, se_ref, t0_ref,
                   cl0_ref, off_ref, cmap_ref, planes_ref, fpl_ref,
                   out_ref, fst_ref, fptr_ref, ptr_ref, win_ref,
                   *, nsteps: int, K: int, r4: int, order0: bool = False,
                   rr: int = R, cf_mode: str = None):
    cf_mode = cf_mode or CF_MODE
    Kc = K
    lanes = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc), 1)
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (Kc, Kc), 1)
    ).astype(jnp.float32)
    irf = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, r4), 2)
    cm = cmap_ref[:, :]        # [3, 128] chunks of cmap[0..256]
    dlen = dlen_ref[:, 0:1]
    sb = sb_ref[:, 0:1]
    se = se_ref[:, 0:1]        # end step (exclusive); sb for a full walk
    t0 = t0_ref[:, 0:1]        # start step (resume offset); 0 normally
    kz = jnp.zeros((rr, 128 - Kc), jnp.int32)

    def pad_k(a):
        return jnp.concatenate([a, kz], axis=1)

    for q in range(rr):
        ptr_ref[q] = 0

    def step(t, states, cl, win, rel):
        if order0:  # format v2: round-robin lane interleave, no S header
            active = (t * Kc + lanes) < dlen
        else:       # format v3/v5: block interleave, lane k owns
            # [k*S, k*S+S); u = global step (resume offset + local)
            u = t0 + t
            active = (u < se) & ((lanes * sb + u) < dlen)
        x = states
        slot = x & (M - 1)
        # full-row search: one-hot over the CLUSTER alone (r4 = #clusters
        # rows — 4x narrower one-hot than the round-2 (cluster, quarter)
        # split) materializes the whole 256-sym cum row as 6-bit planes;
        # no coarse-boundary gathers, no quarter bookkeeping.  The dot is
        # 2-D [rr*K, r4] x [r4, 512] (leading-dim-only reshapes).
        if r4 == 1:  # degenerate order-0 table: the row is a constant,
            # no one-hot needed — broadcast the combined row in the
            # comparison itself
            pr = planes_ref[:, :].astype(jnp.float32)
            cumhi1 = jnp.broadcast_to(
                (pr[0:1, :256] * 64.0 + pr[0:1, 256:])[None], (rr, Kc, 256)
            )
        else:
            oh2 = (cl[:, :, None] == irf).astype(jnp.bfloat16).reshape(
                rr * Kc, r4
            )
            rows = jnp.dot(
                oh2, planes_ref[:, :], preferred_element_type=jnp.float32
            ).reshape(rr, Kc, 512)
            cumhi1 = rows[:, :, :256] * 64.0 + rows[:, :, 256:]  # cum[s+1]-1
        slot_f = slot.astype(jnp.float32)
        if cf_mode == "dots":
            # c/f via bf16 one-hot MXU dots against the static f-planes:
            #   c = sum_{s<sym} f[cl, s]  = ge . fpl   (cum[sym] by def)
            #   f =             f[cl, sym] = eq . fpl
            # Chip A/B (r5, [256, 64Ki]): dec e2e 84.8 ms vs the
            # masked-sum pair's 74 ms — the dot launches + bf16 casts
            # cost more than the removed f32 passes, so "masked" stays
            # the default; kept selectable for future re-measurement.
            ge_bf = (slot_f[:, :, None] > cumhi1).astype(jnp.bfloat16)
            sym_bf = jnp.sum(ge_bf, axis=-1)
            sym = sym_bf.astype(jnp.int32)
            i256 = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, 256), 2)
            eq_bf = (i256 == sym[:, :, None]).astype(jnp.bfloat16)
            fpl = fpl_ref[:, :]  # [256, 128]: [f_hi | pad | f_lo] bf16
            tg = jnp.dot(
                ge_bf.reshape(rr * Kc, 256), fpl,
                preferred_element_type=jnp.float32,
            )
            te = jnp.dot(
                eq_bf.reshape(rr * Kc, 256), fpl,
                preferred_element_type=jnp.float32,
            )
            if r4 == 1:
                c2 = tg[:, 0] * 64.0 + tg[:, 64]
                f2 = te[:, 0] * 64.0 + te[:, 64]
            else:
                ohf = oh2.astype(jnp.float32)  # [rr*Kc, r4] one-hot
                c2 = jnp.sum(
                    ohf * (tg[:, :r4] * 64.0 + tg[:, 64 : 64 + r4]),
                    axis=-1,
                )
                f2 = jnp.sum(
                    ohf * (te[:, :r4] * 64.0 + te[:, 64 : 64 + r4]),
                    axis=-1,
                )
            c = c2.reshape(rr, Kc).astype(jnp.int32)
            f = f2.reshape(rr, Kc).astype(jnp.int32)
        else:
            # c and f via SINGLE-POSITION masked sums (r4 ablation: a
            # masked sum prices like the sym sum; the max/min pair cost
            # ~35 ms).  One-hot masks from iota==sym compares:
            #   c = cumhi1[sym-1] + 1 (0 when sym == 0), f = cum[sym+1]-c
            ge = (slot_f[:, :, None] > cumhi1).astype(jnp.float32)
            sym3 = jnp.sum(ge, axis=-1)
            sym = sym3.astype(jnp.int32)
            i256 = jax.lax.broadcasted_iota(jnp.int32, (rr, Kc, 256), 2)
            oh1 = (i256 == (sym - 1)[:, :, None]).astype(jnp.float32)
            ohs = (i256 == sym[:, :, None]).astype(jnp.float32)
            r1 = jnp.sum(oh1 * cumhi1, axis=-1)
            r2 = jnp.sum(ohs * cumhi1, axis=-1)
            c = r1.astype(jnp.int32) + (sym > 0).astype(jnp.int32)
            f = (r2.astype(jnp.int32) + 1) - c
        newx = f * (x >> PROB_BITS) + slot - c
        x = jnp.where(active, newx, x)
        if not order0:
            cl = jnp.where(
                active, _gather_chunks(cm, pad_k(sym), 2)[:, :Kc], cl
            )

        # shared-stream refill: both candidate bytes via one word gather
        need1 = active & (x < RANS_L)
        need2 = active & (x < (RANS_L >> 8))
        f1 = need1.astype(jnp.float32)
        f2 = need2.astype(jnp.float32)
        rank1 = jax.lax.dot_general(
            f1, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        rank2 = jax.lax.dot_general(
            f2, tri, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.int32)
        cnt1 = jnp.sum(need1.astype(jnp.int32), axis=1, keepdims=True)
        cnt2 = jnp.sum(need2.astype(jnp.int32), axis=1, keepdims=True)
        idx_a = rel + rank1                 # byte index in window
        idx_b = rel + cnt1 + rank2
        bidx = jnp.concatenate([idx_a, idx_b, kz[:, : 128 - 2 * Kc]], axis=1)
        bidx = jnp.clip(bidx, 0, 4 * WW - 1)
        widx = bidx >> 2
        wlo = widx & 127
        w = jnp.where(
            widx < 128, _taa(win[:, :128], wlo), _taa(win[:, 128:], wlo)
        )
        byts = (w >> ((bidx & 3) * 8)) & 0xFF
        b_a = byts[:, :Kc]
        b_b = byts[:, Kc : 2 * Kc]
        x = jnp.where(need1, (x << 8) | b_a, x)
        x = jnp.where(need2, (x << 8) | b_b, x)
        rel = rel + cnt1 + cnt2
        return x, cl, sym, rel

    rid1 = jax.lax.broadcasted_iota(jnp.int32, (rr, 1), 0)

    # last legal 512-aligned window base: keep every reload DMA inside
    # the padded stream block.  Garbage rows happen by design (e.g. the
    # dstall stall branch parses non-stall rows' bytes as a stream and
    # discards the result) — their runaway byte pointers must saturate,
    # not fault the TensorCore with an out-of-bounds DMA.
    nwords = bodyw_ref.shape[1]
    base_max = ((nwords - WW) // 128) << 9

    def reload(rel):
        # per-row window refresh by DIRECT row copies into the scratch
        # ref — the round-2 jnp.where select per row cost O(rr^2 * WW)
        # and capped usable rows at 64
        new_rel = jnp.zeros((rr, 1), jnp.int32)
        for q in range(rr):
            p = ptr_ref[q] + jnp.sum(rel[q : q + 1, 0:1])
            base = pl.multiple_of(
                jnp.minimum((p >> 9) << 9, base_max), 512
            )  # byte base, 512-aligned, clamped in range
            ptr_ref[q] = base
            win_ref[q : q + 1, :] = bodyw_ref[
                q : q + 1, pl.ds(pl.multiple_of((base >> 9) * 128, 128), WW)
            ]
            new_rel = jnp.where(rid1 == q, p - base, new_rel)
        return new_rel

    def supergroup(sg, carry):
        states, cl, rel = carry
        syms = []
        for gg in range(4):
            if gg % 2 == 0:
                rel = reload(rel)
            win = win_ref[:, :]
            for j in range(4):
                states, cl, sym, rel = step(
                    (sg * 4 + gg) * 4 + j, states, cl, win, rel
                )
                syms.append(sym)
        out_ref[:, pl.ds(pl.multiple_of(sg * 16 * Kc, 16 * Kc), 16 * Kc)] = (
            jnp.concatenate(syms, axis=1).astype(jnp.uint8)
        )
        return states, cl, rel

    states = states_ref[:, :]
    if order0:
        cl0 = jnp.zeros((rr, Kc), jnp.int32)
    else:
        cl0 = cl0_ref[:, :]  # callers pass cmap[CTX0] for a fresh walk
    # the window machinery handles an arbitrary per-row byte start: rel
    # begins at the body's offset within the (word-packed) stream, so
    # callers need no rowwise pre-shift of the body to column 0
    rel = off_ref[:, 0:1]
    states, _cl, rel = jax.lax.fori_loop(
        0, nsteps // 16, supergroup, (states, cl0, rel)
    )
    # resume handles: final states + absolute byte pointer (stream
    # coords, same basis as off_ref) so a second launch can continue
    fst_ref[:, :] = states
    for q in range(rr):
        fptr_ref[q : q + 1, :] = rel[q : q + 1, :] + ptr_ref[q]


def _decode_call(body, states, dlen, S_b, cmap_pad, planes4,
                 Smax: int, K: int, order0: bool, interpret: bool,
                 rows: int = R, body_off=None, step_lo=None, step_hi=None,
                 init_cl=None):
    """Shared launcher -> (step-major symbol bytes [B, nsteps16*K],
    nsteps16, final states [B, K], final byte ptr [B]).

    `body_off` [B] i32: per-row byte offset of the body inside `body`
    (default 0 = body aligned to column 0).  The kernel's window reloads
    start at that offset, so callers can pass the whole stream instead of
    paying a rowwise shift to align the body first.

    Resume support (format v5 / drans): `step_lo` [B] = first global
    step this launch decodes (default 0), `step_hi` [B] = end step
    (default S_b), `init_cl` [B, K] = per-lane context clusters at
    step_lo (default cmap[CTX0]).  The returned final states/ptr feed
    the next launch's `states`/`body_off`.
    """
    B, Mb = body.shape
    assert B % rows == 0, B
    assert K % 4 == 0 and 2 * K <= 128 and (4 * K) % 128 == 0, K
    nsteps16 = -(-Smax // 16) * 16
    r4 = planes4.shape[0]
    assert r4 <= 64, r4  # f-plane halves live in fixed 64-lane blocks
    # static f-planes for the c/f dots, derived from the cum planes:
    # f[r, s] = cum_hi[r, s] - cum_hi[r, s-1] (cum_hi[-1] = -1), laid out
    # [256, 128] = [f_hi | pad | f_lo | pad] so the kernel slices
    # lane-aligned 64-column halves
    v = (
        planes4[:, :256].astype(jnp.float32) * 64.0
        + planes4[:, 256:].astype(jnp.float32)
    ).astype(jnp.int32)
    fvals = v - jnp.concatenate(
        [jnp.full((r4, 1), -1, jnp.int32), v[:, :-1]], axis=1
    )
    fpl = (
        jnp.zeros((256, 128), jnp.int32)
        .at[:, :r4].set((fvals >> 6).T)
        .at[:, 64 : 64 + r4].set((fvals & 63).T)
        .astype(jnp.bfloat16)
    )
    if body_off is None:
        body_off = jnp.zeros((B,), jnp.int32)
    if step_lo is None:
        step_lo = jnp.zeros((B,), jnp.int32)
    if step_hi is None:
        step_hi = S_b
    if init_cl is None:
        # cmap[CTX0] = flat index 256 = cmap_pad[2, 0]
        init_cl = jnp.broadcast_to(cmap_pad[2:3, 0:1], (B, K))
    # pack 4 body bytes per i32 word; pad so every window load is in range
    Mp = ((Mb + 511) // 512) * 512 + 4 * WW * 2
    pb = jnp.pad(body, ((0, 0), (0, Mp - Mb))).reshape(B, Mp // 4, 4)
    bodyw = (
        pb[:, :, 0].astype(jnp.int32)
        | (pb[:, :, 1].astype(jnp.int32) << 8)
        | (pb[:, :, 2].astype(jnp.int32) << 16)
        | (pb[:, :, 3].astype(jnp.int32) << 24)
    )
    Wout = nsteps16 * K

    out, fst, fptr = pl.pallas_call(
        functools.partial(
            _decode_kernel, nsteps=nsteps16, K=K, r4=r4, order0=order0,
            rr=rows,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Wout), jnp.uint8),
            jax.ShapeDtypeStruct((B, K), jnp.int32),
            jax.ShapeDtypeStruct((B, 1), jnp.int32),
        ),
        grid=(B // rows,),
        in_specs=[
            pl.BlockSpec((rows, Mp // 4), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 128), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 128), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, Wout), lambda b: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, K), lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 1), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((rows,), jnp.int32),
            pltpu.VMEM((rows, WW), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(
                min(110 << 20,
                    max(16 << 20, 3 * rows * (Mp + Wout) + (16 << 20)))
            )
        ),
        interpret=interpret,
    )(
        bodyw,
        states.astype(jnp.int32),
        dlen.astype(jnp.int32)[:, None],
        S_b.astype(jnp.int32)[:, None],
        step_hi.astype(jnp.int32)[:, None],
        step_lo.astype(jnp.int32)[:, None],
        init_cl.astype(jnp.int32),
        body_off.astype(jnp.int32)[:, None],
        cmap_pad,
        planes4,
        fpl,
    )
    return out, nsteps16, fst, fptr[:, 0]


@functools.partial(
    jax.jit, static_argnames=("Smax", "K", "interpret", "rows")
)
def rans_o1_decode_pallas(body, states, dlen, S_b, cmap_pad, planes4,
                          Smax: int, K: int, interpret: bool = False,
                          rows: int = R, body_off=None):
    """body [B, Mb] u8 (v3 body at column 0, or at per-row byte offset
    `body_off`), states [B, K] i32, dlen/S_b [B] i32 ->
    lane grid [B, K, Smax] u8.

    cmap_pad [3,128] i32 and planes_full [r, 512] bf16 from
    entropy_o1.make_o1_tables.
    """
    B = body.shape[0]
    byts, nsteps16, _, _ = _decode_call(
        body, states, dlen, S_b, cmap_pad, planes4, Smax, K,
        order0=False, interpret=interpret, rows=rows, body_off=body_off,
    )
    grid = byts.reshape(B, nsteps16, K).transpose(0, 2, 1)[:, :, :Smax]
    return grid.astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("Smax", "K", "interpret", "rows")
)
def rans_o1_decode_resume_pallas(body, states, dlen, S_b, cmap_pad, planes4,
                                 Smax: int, K: int, step_lo, step_hi,
                                 init_cl, interpret: bool = False,
                                 rows: int = R, body_off=None):
    """Resumable o1 decode for the drans two-phase walk: decodes global
    steps [step_lo, step_hi) per row -> (lane grid [B, K, Smax] u8 with
    this launch's symbols at LOCAL positions 0.., final states [B, K],
    final absolute byte ptr [B]).  Smax = max steps this launch runs."""
    B = body.shape[0]
    byts, nsteps16, fst, fptr = _decode_call(
        body, states, dlen, S_b, cmap_pad, planes4, Smax, K,
        order0=False, interpret=interpret, rows=rows, body_off=body_off,
        step_lo=step_lo, step_hi=step_hi, init_cl=init_cl,
    )
    grid = byts.reshape(B, nsteps16, K).transpose(0, 2, 1)[:, :, :Smax]
    return grid.astype(jnp.uint8), fst, fptr


def make_o0_dec_tables(cume):
    """Degenerate single-cluster decode tables from a [257] i32 CDF-with-
    sentinel (engine/entropy._cum_ext): (cmap_pad, planes_full)."""
    cum_hi = cume[1:257].astype(jnp.int32)  # cum[s+1]
    cmap_pad = jnp.zeros((3, 128), jnp.int32)
    v = (cum_hi - 1).reshape(1, 256)
    planes = jnp.concatenate([v >> 6, v & 63], axis=1).astype(jnp.bfloat16)
    return cmap_pad, planes


@functools.partial(
    jax.jit, static_argnames=("N", "K", "interpret", "rows")
)
def rans_decode_shared_pallas(body, states, dlen, cume, N: int, K: int,
                              interpret: bool = False, rows: int = R,
                              body_off=None):
    """Order-0 shared-stream decode (wire format v2) on the same kernel:
    body [B, Mb] u8 (at column 0 or per-row offset body_off), states
    [B, K] i32, dlen [B] i32, cume [257] i32 ->
    data [B, N] u8 (round-robin lane layout, idx = t*K + lane)."""
    B = body.shape[0]
    nsteps = -(-N // K)
    cmap_pad, planes4 = make_o0_dec_tables(cume)
    byts, _, _, _ = _decode_call(
        body, states, dlen, jnp.zeros((B,), jnp.int32), cmap_pad,
        planes4, nsteps, K, order0=True, interpret=interpret, rows=rows,
        body_off=body_off,
    )
    return byts[:, :N].astype(jnp.uint8)
