"""Batched drans (format v5) — self-contained dynamic order-1 rANS.

TPU engine for codecs/drans.py: lane-grid steps t < ceil(S/4) code with
the canned o1 table, then a bucketed histogram of those prefix symbols
(fitted identically by encoder and decoder — tables/drans.py) codes the
remaining steps.  NO table bytes in the stream; in-sample == held-out
by construction.  Byte-exact with drans_press_reads/drans_depress_reads
over the same batch grouping; the [G:u16] stream header records the
group's non-empty-stream count so mismatched groupings fail loudly
(ADVICE r4 item 2).

Round-5 change (VERDICT r4 item 4): the table fit runs ON DEVICE —
`fit_tables_device` reproduces tables.drans.dnorm bit-exactly in int32
(same prescale), so encode and decode are each a SINGLE jit with no
host transfer between the two decode walks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from honours_tpu.engine.bits import read_u16le, read_u32le, u16le_bytes
from honours_tpu.engine.entropy_o1 import (
    _lane_grid,
    _o1_fc,
    _ungrid,
    encode_from_fc,
    make_o1_tables,
)
from honours_tpu.engine.permute import monotone_expand
from honours_tpu.engine.vbbe21 import (
    vbbe21_fill_batch,
    vbbe21_parse_batch,
    vbbe21_parts_batch,
)
from honours_tpu.kernels.rans import CTX0, M, PROB_BITS, RANS_L, K_SHARED
from honours_tpu.tables.drans import (
    NB,
    PREFIX_DEN,
    W_FIT,
    base_rows,
    bucket_of,
    fit_freqs,
)

U32 = jnp.uint32


def make_drans_tables(freq257: np.ndarray) -> dict:
    """Host-route device tables for a fitted [257, 256] drans table
    (test oracle for fit_tables_device; streams are identical)."""
    return make_o1_tables(np.asarray(freq257))


# ---------------------------------------------------------------------------
# device-side table fit (bit-identical to tables.drans.fit_freqs)
# ---------------------------------------------------------------------------

_STATIC = None


def _fit_statics():
    """(cmap [257] i32, cmap_pad [3,128] i32, base [NB,256] i32) — the
    bucket map is closed-form so these are true constants.

    Cached as NUMPY arrays on purpose: the first call can happen inside
    a jit trace (_drans_enc/_drans_dec), where jnp.asarray would return
    a trace-local constant Tracer — caching that leaks it into every
    later trace (UnexpectedTracerError, order-dependent across the
    suite).  np constants embed safely into any trace."""
    global _STATIC
    if _STATIC is None:
        bm = np.asarray(bucket_of(np.arange(257, dtype=np.int64)))
        pad = np.zeros((3, 128), np.int64)
        pad.reshape(-1)[:257] = bm
        _STATIC = (
            bm.astype(np.int32),
            pad.astype(np.int32),
            np.asarray(base_rows(), dtype=np.int32),
        )
    return _STATIC


def _dnorm_rows(e):
    """[NB, 256] i32 count rows -> [NB, 256] rows summing to M.

    Bit-identical to tables.drans.dnorm per row: the prescale keeps
    e*t < 2^31 so every intermediate is int32-exact, and the remainder
    key embeds the symbol index so the sort order is unique (no
    tie-breaking dependence on sort stability)."""
    present = (e > 0).astype(jnp.int32)
    npres = present.sum(axis=1, keepdims=True)
    tot = e.sum(axis=1, keepdims=True)
    s = (tot >> 17) + 1
    e = jnp.maximum(e // s, present)
    tot = e.sum(axis=1, keepdims=True)
    t = M - npres
    q = (e * t) // tot
    rem = e * t - q * tot
    f = q + present
    diff = M - f.sum(axis=1, keepdims=True)
    key = rem * 256 + (255 - jnp.arange(256, dtype=jnp.int32)[None, :])
    order = jnp.argsort(-key, axis=1)
    rank = jnp.argsort(order, axis=1)
    return f + (rank < diff).astype(jnp.int32)


@jax.jit
def fit_tables_device(counts):
    """[NB, 256] i32 prefix counts -> engine tables dict, entirely on
    device.  Streams produced with these tables are byte-identical to
    make_drans_tables(fit_freqs(counts)) — the planes use the NB bucket
    rows directly instead of np.unique clusters, which changes only the
    internal cluster numbering, not any (f, c) value."""
    cmap, cmap_pad, base = _fit_statics()
    rows = _dnorm_rows(counts * W_FIT + base)  # [NB, 256]
    cum = jnp.cumsum(rows, axis=1)             # cum[s+1]
    clo = cum - rows
    v = cum - 1
    planes = jnp.concatenate([v >> 6, v & 63], axis=1).astype(jnp.bfloat16)
    fc = rows + clo * 8192
    fc_tab = (
        jnp.zeros((128 * 128,), jnp.int32)
        .at[: NB * 256]
        .set(fc.reshape(-1))
        .reshape(128, 128)
    )
    r257 = jnp.take(rows, cmap, axis=0)  # [257, 256]
    c257 = jnp.take(clo, cmap, axis=0)
    cum_ext = jnp.concatenate(
        [jnp.zeros((257, 1), jnp.int32), jnp.cumsum(r257, axis=1)], axis=1
    )
    return dict(
        planes_full=planes,
        flat_f=r257.reshape(-1),
        flat_c=c257.reshape(-1),
        cum_ext=cum_ext,
        cmap=cmap,
        cmap_pad=cmap_pad,
        fc_tab=fc_tab,
    )


# ---------------------------------------------------------------------------
# device histogram (exact integer counts)
# ---------------------------------------------------------------------------

_HCHUNK = 1 << 17


@jax.jit
def o1_prefix_hist(g3, ctx3, act3, S_b, T0_b):
    """Histogram (bucket(ctx), sym) over prefix lane-grid positions.

    g3/ctx3 [B, K, Smax] i32, act3 bool, T0_b [B] i32.  Returns
    [NB, 256] i32, exact (chunked one-hot matmuls; every per-chunk cell
    count <= 2^17 so the f32 accumulation is integer-exact).

    The chunking walks the STEP axis and keeps rows intact, so under a
    row-sharded mesh the contraction over B becomes per-device partial
    histograms + one [64, 256] all-reduce — the multichip shared-fit
    collective rides ICI instead of forcing a batch re-gather.

    Scale bound (ADVICE r4 item 3): the int32 accumulator wraps if one
    (bucket, symbol) cell exceeds 2^31 prefix positions, i.e. > 8.6 GB
    of residual bytes in a SINGLE batch.  The batch is the compression
    unit (engine buckets are <= max_b * L = 256 * 1 MiB = 256 MiB of
    signal, ~2^26 prefix positions), so the bound is unreachable through
    the runner; callers building custom giant batches must chunk them.
    """
    B, K, Smax = g3.shape
    assert B * K * Smax < (1 << 31), (
        "per-batch prefix positions would overflow the int32 histogram"
    )
    assert B <= _HCHUNK, "row count exceeds the exact-f32 chunk bound"
    t = jnp.arange(Smax, dtype=jnp.int32)[None, None, :]
    mask = act3 & (t < T0_b[:, None, None])
    T = K * Smax
    sym = g3.reshape(B, T)
    bkt = bucket_of(ctx3).reshape(B, T)
    m = mask.reshape(B, T)
    ch = max(1, _HCHUNK // B)
    Tp = -(-T // ch) * ch
    sym = jnp.pad(sym, ((0, 0), (0, Tp - T)))
    bkt = jnp.pad(bkt, ((0, 0), (0, Tp - T)))
    m = jnp.pad(m, ((0, 0), (0, Tp - T)))
    i64 = jnp.arange(64, dtype=jnp.int32)
    i256 = jnp.arange(256, dtype=jnp.int32)

    def body(i, acc):
        sl = lambda a: jax.lax.dynamic_slice(a, (0, i * ch), (B, ch))
        s, b, mm = sl(sym), sl(bkt), sl(m)
        ohb = (
            (b[:, :, None] == i64[None, None, :]) & mm[:, :, None]
        ).astype(jnp.bfloat16)
        ohs = (s[:, :, None] == i256[None, None, :]).astype(jnp.bfloat16)
        c = jax.lax.dot_general(
            ohb, ohs, dimension_numbers=(((0, 1), (0, 1)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + c.astype(jnp.int32)

    counts = jax.lax.fori_loop(
        0, Tp // ch, body, jnp.zeros((64, 256), jnp.int32)
    )
    return counts[:NB]


# ---------------------------------------------------------------------------
# encode — ONE jit: parts + histogram + device fit + dyn walk + assembly
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("emax",))
def _drans_enc(sig, n, tabs_canned, emax: int, member=None):
    from honours_tpu.engine.bits import rowwise_concat
    from honours_tpu.engine.pipeline import _zd_parts

    B, L = sig.shape
    K = K_SHARED
    zd0, rest = _zd_parts(sig, n)
    parts = vbbe21_parts_batch(rest, n - 1, emax)
    data, dlen = parts["data"], parts["data_len"]
    Smax = -(-data.shape[1] // K)
    g3, ctx3, act3, S_b = _lane_grid(data, dlen, K, Smax)
    T0_b = -(-S_b // PREFIX_DEN)
    # rows whose exception count overflows the static cap produce capped
    # (invalid) streams that the runner re-encodes on the host — they
    # must not contribute to the shared fit or to G, or every OTHER
    # row's group count would disagree with the decoder's
    include = parts["nex"] <= emax
    if member is not None:
        # dstall_drans branch groups: non-member rows still emit streams
        # (the caller discards them) but contribute nothing to the
        # shared fit or to G, so the stored G matches the decoder's
        # flag-derived membership
        include = include & member
    counts = o1_prefix_hist(
        g3, ctx3, act3 & include[:, None, None], S_b, T0_b
    )
    tabs_fit = fit_tables_device(counts)
    G = jnp.sum(((S_b > 0) & include).astype(jnp.int32))

    g, c_ = g3.reshape(B, -1), ctx3.reshape(B, -1)
    fa, ca = _o1_fc(g, c_, tabs_canned)
    fb, cb = _o1_fc(g, c_, tabs_fit)
    t = jnp.arange(Smax, dtype=jnp.int32)[None, None, :]
    pre = t < T0_b[:, None, None]
    f3 = jnp.where(pre, fa.reshape(B, K, Smax), fb.reshape(B, K, Smax))
    c3 = jnp.where(pre, ca.reshape(B, K, Smax), cb.reshape(B, K, Smax))
    segs_body, planew = encode_from_fc(f3, c3, act3, S_b, K, parts=True)

    segs = (
        [
            (
                u16le_bytes(jnp.broadcast_to(G, (B,))),
                jnp.full((B,), 2, jnp.int32),
            ),
            (u16le_bytes(zd0), jnp.full((B,), 2, jnp.int32)),
        ]
        + parts["exsegs"]
        + segs_body
    )
    total = (
        2 + 2 + 4 + (4 + 4 * emax + 1) + (4 + 2 * emax + 1) + 6
        + (4 + 4 * K + planew)
    )
    return rowwise_concat(segs, total)


def press_drans_batch(sig, n, tabs_canned, emax: int = None, member=None):
    """Batched drans_vbbe21_zd encode -> (stream [B, M] u8, len [B]).

    One jitted pass; the fit runs on device.  `tabs_canned` from
    pipeline.canned_o1_device_tables().  `member` [B] bool restricts the
    shared fit and the G count to a sub-group (dstall_drans branches);
    non-member rows still produce (discardable) streams."""
    B, L = sig.shape
    emax = emax or L
    return _drans_enc(sig, n, tabs_canned, emax, member)


# ---------------------------------------------------------------------------
# decode — ONE jit: parse + prefix walk + device fit + suffix walk
# ---------------------------------------------------------------------------


def _grid_ctx(grid, S_b, dlen, K: int):
    """In-lane predecessor contexts of a lane grid (CTX0 at t=0)."""
    B, K_, T = grid.shape
    g = grid.astype(jnp.int32)
    return jnp.concatenate(
        [jnp.full((B, K_, 1), CTX0, jnp.int32), g[:, :, :-1]], axis=2
    )


@functools.partial(jax.jit, static_argnames=("T", "K"))
def _xla_walk_phase(body, states, ptr, ctx, cume, S_b, dlen, t_lo, t_hi,
                    T: int, K: int):
    """XLA fallback resumable walk: decodes local steps i in [0, T) at
    global step t_lo + i while t_lo + i < t_hi.  Returns (out [B, K, T],
    states, ptr, ctx)."""
    B, Mb = body.shape
    lanes = jnp.arange(K, dtype=jnp.int32)[None, :]

    def body_fn(i, carry):
        states, ptr, ctx, out = carry
        t = t_lo[:, None] + i
        active = (t < t_hi[:, None]) & (
            (lanes * S_b[:, None] + t) < dlen[:, None]
        )
        x = states
        slot = (x & jnp.uint32(M - 1)).astype(jnp.int32)
        rows = jnp.take(cume, ctx, axis=0)  # [B, K, 257]
        ge = (slot[:, :, None] >= rows[:, :, 1:]).astype(jnp.int32)
        sym = ge.sum(axis=2)
        c = jnp.sum(ge * (rows[:, :, 1:] - rows[:, :, :256]), axis=2)
        i256 = jnp.arange(256, dtype=jnp.int32)
        eq = (sym[:, :, None] == i256[None, None, :]).astype(jnp.int32)
        f = jnp.sum(eq * (rows[:, :, 1:] - rows[:, :, :256]), axis=2)
        out = jax.lax.dynamic_update_slice(
            out, sym.astype(jnp.uint8)[:, :, None], (0, 0, i)
        )
        newx = f.astype(U32) * (x >> jnp.uint32(PROB_BITS)) + slot.astype(
            U32
        ) - c.astype(U32)
        x = jnp.where(active, newx, x)
        for _ in range(2):
            under = active & (x < jnp.uint32(RANS_L))
            rank = jnp.cumsum(under.astype(jnp.int32), axis=1) - under.astype(
                jnp.int32
            )
            bidx = jnp.clip(ptr[:, None] + rank, 0, Mb - 1)
            b = jnp.take_along_axis(body, bidx, axis=1).astype(U32)
            x = jnp.where(under, (x << jnp.uint32(8)) | b, x)
            ptr = ptr + under.sum(axis=1).astype(jnp.int32)
        ctx = jnp.where(active, sym, ctx)
        return x, ptr, ctx, out

    out = jnp.zeros((B, K, T), dtype=jnp.uint8)
    states, ptr, ctx, out = jax.lax.fori_loop(
        0, T, body_fn, (states, ptr, ctx, out)
    )
    return out, states, ptr, ctx


@functools.partial(jax.jit, static_argnames=("Smax", "K", "T2"))
def _merge_grids(grid1, grid2, T0_b, S_b, Smax: int, K: int, T2: int):
    """Local phase grids -> global lane grid [B, K, Smax]."""
    B = grid1.shape[0]
    g1 = jnp.pad(grid1.astype(jnp.int32),
                 ((0, 0), (0, 0), (0, Smax - grid1.shape[2])))
    r2 = grid2.astype(jnp.int32).reshape(B * K, T2)
    if Smax > T2:
        r2 = jnp.pad(r2, ((0, 0), (0, Smax - T2)))
    sh = jnp.repeat(T0_b, K)[:, None]
    cols = jnp.arange(Smax, dtype=jnp.int32)[None, :]
    cnt2 = jnp.repeat(S_b - T0_b, K)[:, None]
    shifted, _ = monotone_expand(
        r2[:, :Smax], jnp.broadcast_to(sh, (B * K, Smax)),
        cols < cnt2, Smax,
    )
    t3 = jnp.arange(Smax, dtype=jnp.int32)[None, None, :]
    return jnp.where(
        t3 < T0_b[:, None, None], g1, shifted.reshape(B, K, Smax)
    ).astype(jnp.uint8)


@functools.partial(
    jax.jit, static_argnames=("L", "emax", "rows", "T1", "T2")
)
def _drans_dec(stream, n, tabs_canned, L: int, emax: int, rows: int,
               T1: int, T2: int, member=None):
    """Single-jit decode: parse + canned prefix walk + device fit +
    fitted suffix walk + merge + fill.  Returns ([B, L] int16, g_ok)."""
    from honours_tpu.engine.pipeline import _zd_merge

    B, Mb = stream.shape
    K = K_SHARED
    Smax = -(-L // K)
    zero = jnp.zeros((B,), jnp.int32)
    g_hdr = read_u16le(stream, zero).astype(jnp.int32)
    zd0 = read_u16le(stream, zero + 2)
    parsed = vbbe21_parse_batch(
        stream, jnp.full((B,), 4, jnp.int32), n - 1, L, emax
    )
    base_off = parsed["end_off"]
    dlen = n - 1 - parsed["nex"]
    S_b = read_u32le(stream, base_off).astype(jnp.int32)
    T0_b = -(-S_b // PREFIX_DEN)
    include = parsed["nex"] <= emax
    if member is not None:
        include = include & member
    states = _rd_states(stream, base_off, K)

    if rows:
        from honours_tpu.engine.rans_o1_pallas import (
            rans_o1_decode_resume_pallas,
        )

        grid1, fst, fptr = rans_o1_decode_resume_pallas(
            stream, states.astype(jnp.int32), dlen, S_b,
            tabs_canned["cmap_pad"], tabs_canned["planes_full"], T1, K,
            jnp.zeros((B,), jnp.int32), T0_b,
            jnp.broadcast_to(tabs_canned["cmap_pad"][2:3, 0:1], (B, K)),
            rows=rows, body_off=base_off + 4 + 4 * K,
        )
        ctx1 = jnp.zeros((B, K), jnp.int32)  # unused on the kernel route
    else:
        from honours_tpu.engine.permute import rowwise_shift_left

        body = rowwise_shift_left(stream, base_off + 4 + 4 * K, Mb)
        grid1, fst, fptr, ctx1 = _xla_walk_phase(
            body, states, jnp.zeros((B,), jnp.int32),
            jnp.full((B, K), CTX0, jnp.int32), tabs_canned["cum_ext"],
            S_b, dlen, jnp.zeros((B,), jnp.int32), T0_b, T1, K,
        )
    ctx3 = _grid_ctx(grid1, S_b, dlen, K)
    t = jnp.arange(T1, dtype=jnp.int32)[None, None, :]
    lanes = jnp.arange(K, dtype=jnp.int32)[None, :, None]
    act3 = (t < T0_b[:, None, None]) & (
        (lanes * S_b[:, None, None] + t) < dlen[:, None, None]
    )
    counts = o1_prefix_hist(
        grid1.astype(jnp.int32), ctx3,
        act3 & include[:, None, None], S_b, T0_b,
    )
    tabs_fit = fit_tables_device(counts)
    last = jnp.take_along_axis(
        grid1.astype(jnp.int32),
        jnp.clip(T0_b - 1, 0, T1 - 1)[:, None, None].astype(jnp.int32)
        * jnp.ones((B, K, 1), jnp.int32),
        axis=2,
    )[:, :, 0]

    if rows:
        from honours_tpu.engine.rans_o1_pallas import (
            rans_o1_decode_resume_pallas,
        )

        cmap = tabs_fit["cmap"]
        has = (T0_b[:, None] > 0) & (
            (jnp.arange(K, dtype=jnp.int32)[None, :] * S_b[:, None])
            < dlen[:, None]
        )
        cl2 = jnp.where(
            has, jnp.take(cmap, jnp.clip(last, 0, 255)), jnp.take(cmap, 256)
        )
        grid2, _, _ = rans_o1_decode_resume_pallas(
            stream, fst, dlen, S_b,
            tabs_fit["cmap_pad"], tabs_fit["planes_full"], T2, K,
            T0_b, S_b, cl2, rows=rows, body_off=fptr,
        )
    else:
        from honours_tpu.engine.permute import rowwise_shift_left

        body = rowwise_shift_left(stream, base_off + 4 + 4 * K, Mb)
        grid2, _, _, _ = _xla_walk_phase(
            body, fst, fptr, ctx1, tabs_fit["cum_ext"], S_b, dlen,
            T0_b, S_b, T2, K,
        )
    grid = _merge_grids(grid1, grid2, T0_b, S_b, Smax, K, T2)
    data = _ungrid(grid, S_b, dlen, K, Smax, L)
    vals = vbbe21_fill_batch(parsed, data, n - 1, L)
    out = _zd_merge(zd0, vals, n, L)
    g_expected = jnp.sum(((S_b > 0) & include).astype(jnp.int32))
    g_ok = (S_b == 0) | ~include | (g_hdr == g_expected)
    return out, g_ok


def depress_drans_batch(stream, n, tabs_canned, L: int, emax: int = None,
                        member=None):
    """Batched drans_vbbe21_zd decode -> [B, L] int16.  Must receive the
    same batch grouping the encoder used (the fit is batch-shared);
    raises ValueError when any stream's G header disagrees.  `member`
    [B] bool restricts the shared fit / G check to a sub-group
    (dstall_drans branches); non-member rows decode to garbage the
    caller discards."""
    import os

    from honours_tpu.engine.rans_o1_pallas import pick_dec_rows

    B, Mb = stream.shape
    emax = emax or L
    Smax = -(-L // K_SHARED)
    T1 = -(-Smax // PREFIX_DEN)
    T2 = max(Smax - T1, 1)  # max suffix steps: S-ceil(S/4) nondecreasing
    rows = 0
    if jax.default_backend() == "tpu":
        r = int(os.environ.get("HTPU_DEC_ROWS", 0)) or pick_dec_rows(
            B, L, Mb
        )
        rows = r if (r and B % r == 0) else 0
    out, g_ok = _drans_dec(stream, n, tabs_canned, L, emax, rows, T1, T2,
                           member)
    if not bool(jnp.all(g_ok)):
        bad = np.flatnonzero(~np.asarray(g_ok))
        raise ValueError(
            f"drans group mismatch: rows {bad[:8].tolist()} carry a G "
            "header that disagrees with this batch's non-empty-stream "
            "count; decode with the original encode grouping"
        )
    return out


def _rd_states(stream, base_off, K: int):
    B, Mb = stream.shape
    lanes = jnp.arange(K, dtype=jnp.int32)[None, :]

    def b(i, off):
        return jnp.take_along_axis(
            stream, jnp.clip(off + i, 0, Mb - 1), axis=1
        ).astype(U32)

    so = base_off[:, None] + 4 + 4 * jnp.broadcast_to(lanes, (B, K))
    return b(0, so) | (b(1, so) << 8) | (b(2, so) << 16) | (b(3, so) << 24)
