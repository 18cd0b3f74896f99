"""Scatter/gather-free data-movement primitives for TPU.

XLA's general gather/scatter lower to ~100M elem/s loops on TPU (measured
on v5e: 43 ms for a 4M-element take_along_axis, 25 ms for the matching
scatter, 730 ms for a vmapped searchsorted).  Every hot path in the codec
engines is a *monotone* permutation (offsets produced by cumsum), which
admits an O(log N)-pass formulation out of `jnp.where` + statically-shifted
slices only — each pass runs at full VPU/HBM speed.

Primitives:
  monotone_compact(values, keep)          — pack kept elements left
  monotone_expand(values, shift, valid)   — element j lands at j + shift[j]
  rowwise_shift_right(buf, shift, width)  — whole-row shift by per-row scalar
  rowwise_concat(segments, total)         — ragged row concat via shifts

Proof sketch for the log-shift walk (value + remaining-shift channels move
together; moved-from slots are killed):
  compact (move left by h = holes-before, LSB→MSB): for kept j < j',
  intermediate gap = (j'-j) - ((h[j'] mod 2^k) - (h[j] mod 2^k))
  ≥ (j'-j) - (h[j']-h[j]) ≥ 1, so kept elements never collide.
  expand (move right by non-decreasing s, MSB→LSB): floor-to-2^k of a
  non-decreasing sequence is non-decreasing, so the partial shifts keep
  targets ordered.  (The mirrored orders fail: see tests.)

These replace the reference's serial byte emission loops
(press/press.c:2803-2817 exception scans, press/svb16/encode_scalar.c).
"""

from __future__ import annotations

import jax.numpy as jnp


def _shift_left(a: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    """a[:, j] <- a[:, j+k] (static k), filling the tail."""
    B = a.shape[0]
    pad = jnp.full((B, k), fill, a.dtype)
    return jnp.concatenate([a[:, k:], pad], axis=1)


def _shift_right(a: jnp.ndarray, k: int, fill) -> jnp.ndarray:
    B = a.shape[0]
    pad = jnp.full((B, k), fill, a.dtype)
    return jnp.concatenate([pad, a[:, :-k]], axis=1)


def _nbits(n: int) -> int:
    return max(1, (int(n) - 1).bit_length())


def _pallas_walks():
    """TPU route: the VMEM-resident walk kernels (permute_pallas.py) —
    one HBM read+write instead of log2(N) full passes."""
    import jax

    from honours_tpu.engine import permute_pallas as pp

    return pp if jax.default_backend() == "tpu" else None


def monotone_compact(values, keep, fill=0):
    """Pack kept elements to the left of each row, preserving order.

    values [B, N] (any integer dtype), keep [B, N] bool.
    Returns (out [B, N], count [B]) where out[b, :count[b]] are the kept
    values in order and the rest is `fill`.
    """
    B, N = values.shape
    pp = _pallas_walks()
    if pp is not None and fill == 0 and N <= (
        pp.MAX_COLS if values.dtype == jnp.uint8 else pp.MAX_COLS_WIDE
    ):
        return pp.compact_walk(values, keep)
    holes = jnp.cumsum((~keep).astype(jnp.int32), axis=1) - (~keep).astype(
        jnp.int32
    )  # exclusive: holes strictly before j
    count = keep.sum(axis=1).astype(jnp.int32)
    # fuse (shift, alive) into one word: w = shift << 1 | alive — one
    # array less per pass, and the passes run at HBM speed.  8-bit
    # payloads ride inside the word too (w = s<<9 | v<<1 | alive), so a
    # byte compaction touches exactly one i32 array per pass.  NOT taken
    # on TPU: XLA miscompiles the fused u8 walk at B=256 (reproduced on
    # hardware); the TPU route above is the Pallas kernel instead.
    if values.dtype == jnp.uint8 and N < (1 << 22) and pp is None:
        w = jnp.where(
            keep, (holes << 9) | (values.astype(jnp.int32) << 1) | 1, 0
        )
        for k in range(_nbits(N)):
            wbit = 1 << (k + 9)
            src_w = _shift_left(w, 1 << k, 0)
            incoming = (src_w & (1 | wbit)) == (1 | wbit)
            leaving = (w & (1 | wbit)) == (1 | wbit)
            # no bit-clear needed: each shift bit is consumed in exactly
            # one pass, so the word keeps its payload intact
            w = jnp.where(incoming, src_w, jnp.where(leaving, 0, w))
        alive = (w & 1) == 1
        out = ((w >> 1) & 0xFF).astype(jnp.uint8)
        return jnp.where(alive, out, jnp.asarray(fill, jnp.uint8)), count
    w = jnp.where(keep, (holes << 1) | 1, 0)
    a = values
    for k in range(_nbits(N)):
        bit = 1 << k
        wbit = bit << 1
        src_a = _shift_left(a, bit, 0)
        src_w = _shift_left(w, bit, 0)
        incoming = (src_w & (1 | wbit)) == (1 | wbit)
        leaving = (w & (1 | wbit)) == (1 | wbit)
        a = jnp.where(incoming, src_a, a)
        w = jnp.where(incoming, src_w, jnp.where(leaving, 0, w))
    alive = (w & 1) == 1
    return jnp.where(alive, a, jnp.asarray(fill, a.dtype)), count


def compaction_shifts(keep):
    """Expansion shifts of the kept elements: out[i] = (grid position of
    the i-th kept element) - i = holes-before-it, packed left.

    Because every shift bit is consumed in exactly one pass, the walk
    never needs to clear bits — so the holes count doubles as both the
    routing shift AND the payload, and the whole compaction touches one
    i32 array per pass.  Feeding (shifts, count) to monotone_expand
    inverts the compaction.  Returns (shifts [B, N] i32, count [B]).
    """
    B, N = keep.shape
    pp = _pallas_walks()
    if pp is not None and N <= pp.MAX_COLS:
        return pp.compaction_shifts_walk(keep)
    holes = jnp.cumsum((~keep).astype(jnp.int32), axis=1) - (~keep).astype(
        jnp.int32
    )
    w = jnp.where(keep, (holes << 1) | 1, 0)
    for k in range(_nbits(N)):
        wbit = 1 << (k + 1)
        src_w = _shift_left(w, 1 << k, 0)
        incoming = (src_w & (1 | wbit)) == (1 | wbit)
        leaving = (w & (1 | wbit)) == (1 | wbit)
        w = jnp.where(incoming, src_w, jnp.where(leaving, 0, w))
    alive = (w & 1) == 1
    count = keep.sum(axis=1).astype(jnp.int32)
    return jnp.where(alive, w >> 1, 0), count


def monotone_expand(values, shift, valid, width: int, fill=0):
    """Element j of each row lands at column j + shift[j].

    shift must be non-decreasing over valid elements (targets strictly
    increasing).  values/shift/valid [B, N]; returns (out [B, width],
    covered [B, width] bool).
    """
    B, N = values.shape
    if width < N:
        raise ValueError("width must be >= N")
    pp = _pallas_walks()
    if pp is not None and fill == 0 and width <= (
        pp.MAX_COLS if values.dtype == jnp.uint8 else pp.MAX_COLS_WIDE
    ):
        return pp.expand_walk(values, shift, valid, width)
    pad = width - N
    max_shift = width  # caller guarantees targets < width
    # pp is None guard: see the TPU u8-walk miscompile note above
    if values.dtype == jnp.uint8 and width < (1 << 22) and pp is None:
        w = jnp.where(
            valid, (shift << 9) | (values.astype(jnp.int32) << 1) | 1, 0
        )
        w = jnp.pad(w, ((0, 0), (0, pad)))
        for k in reversed(range(_nbits(max_shift))):
            wbit = 1 << (k + 9)
            src_w = _shift_right(w, 1 << k, 0)
            incoming = (src_w & (1 | wbit)) == (1 | wbit)
            leaving = (w & (1 | wbit)) == (1 | wbit)
            w = jnp.where(incoming, src_w, jnp.where(leaving, 0, w))
        alive = (w & 1) == 1
        out = ((w >> 1) & 0xFF).astype(jnp.uint8)
        return jnp.where(alive, out, jnp.asarray(fill, jnp.uint8)), alive
    a = jnp.pad(values, ((0, 0), (0, pad)))
    w = jnp.pad(
        jnp.where(valid, (shift << 1) | 1, 0), ((0, 0), (0, pad))
    )
    for k in reversed(range(_nbits(max_shift))):
        bit = 1 << k
        wbit = bit << 1
        src_a = _shift_right(a, bit, 0)
        src_w = _shift_right(w, bit, 0)
        incoming = (src_w & (1 | wbit)) == (1 | wbit)
        leaving = (w & (1 | wbit)) == (1 | wbit)
        a = jnp.where(incoming, src_a, a)
        w = jnp.where(incoming, src_w, jnp.where(leaving, 0, w))
    alive = (w & 1) == 1
    return jnp.where(alive, a, jnp.asarray(fill, a.dtype)), alive


def forward_fill(values, alive):
    """Replace dead positions with the nearest alive value to their left.

    values/alive [B, N].  Positions before the first alive value keep
    their original value.  O(log N) passes.
    """
    B, N = values.shape
    a, al = values, alive
    for k in range(_nbits(N)):
        bit = 1 << k
        src_a = _shift_right(a, bit, 0)
        src_al = _shift_right(al, bit, False)
        take = (~al) & src_al
        a = jnp.where(take, src_a, a)
        al = al | src_al
    return a


def seg_or_scan(values, seg_id):
    """Inclusive OR-scan within runs of equal seg_id (non-decreasing).

    values [B, N] uint32, seg_id [B, N] int32.  Returns scanned [B, N];
    the last element of each run holds the OR of the whole run.
    """
    B, N = values.shape
    a = values
    for k in range(_nbits(N)):
        bit = 1 << k
        src_a = _shift_right(a, bit, 0)
        src_t = _shift_right(seg_id, bit, -1)
        same = src_t == seg_id
        a = jnp.where(same, a | src_a, a)
    return a


def rowwise_shift_left(buf, shift, width: int, fill=0):
    """Shift each row left by its own scalar amount; out width `width`."""
    B, M = buf.shape
    shift = shift.astype(jnp.int32)
    pp = _pallas_walks()
    if pp is not None and fill == 0 and M <= (
        pp.MAX_COLS if buf.dtype == jnp.uint8 else pp.MAX_COLS_WIDE
    ):
        # A whole-row left shift IS a monotone compaction: keep the row
        # suffix [shift, M) and pack it to column 0 — ONE VMEM-resident
        # walk instead of log2(M) predicated full-HBM rolls.
        cols = jnp.arange(M, dtype=jnp.int32)[None, :]
        out, _ = pp.compact_walk(buf, cols >= shift[:, None])
        if width > M:
            out = jnp.pad(out, ((0, 0), (0, width - M)))
        return out[:, :width]
    a = buf
    for k in range(_nbits(M)):
        bit = 1 << k
        rolled = _shift_left(a, bit, fill)
        a = jnp.where((shift[:, None] & bit) != 0, rolled, a)
    if width > M:
        a = jnp.pad(a, ((0, 0), (0, width - M)), constant_values=fill)
    return a[:, :width]


def rowwise_shift_right(buf, shift, width: int, fill=0):
    """Shift each row right by its own scalar amount (binary-decomposed
    static rolls).  buf [B, M] -> out [B, width]; bytes shifted past the
    end are dropped."""
    B, M = buf.shape
    shift = shift.astype(jnp.int32)
    pp = _pallas_walks()
    if pp is not None and fill == 0 and width <= (
        pp.MAX_COLS if buf.dtype == jnp.uint8 else pp.MAX_COLS_WIDE
    ):
        # A whole-row right shift IS a monotone expansion with a
        # constant per-row shift (elements that would land past `width`
        # are invalidated) — ONE VMEM-resident walk instead of
        # log2(width) predicated full-HBM rolls.
        if width > M:
            buf = jnp.pad(buf, ((0, 0), (0, width - M)))
        elif width < M:
            buf = buf[:, :width]
        cols = jnp.arange(width, dtype=jnp.int32)[None, :]
        valid = cols < (width - shift[:, None])
        sh = jnp.broadcast_to(jnp.where(valid, shift[:, None], 0), buf.shape)
        out, _ = pp.expand_walk(buf, sh, valid, width)
        return out
    if width > M:
        buf = jnp.pad(buf, ((0, 0), (0, width - M)), constant_values=fill)
    elif width < M:
        buf = buf[:, :width]
    a = buf
    for k in range(_nbits(width)):
        bit = 1 << k
        rolled = _shift_right(a, bit, fill)
        a = jnp.where((shift[:, None] & bit) != 0, rolled, a)
    return a


def rowwise_concat(segments, total_cols: int):
    """Concatenate variable-length row segments without gathers.

    segments: list of (buf [B, Mi] u8, len [B] int32) — dense prefix
    segments — or (buf [B, Mi], keep [B, Mi] bool) — SPARSE segments
    whose kept elements may sit anywhere in the buffer (e.g. an
    entropy-coder output plane before compaction; folding its
    compaction into this walk saves a whole full-width pass).
    Returns (out [B, total_cols] u8, total_len [B]).

    Concatenation IS a monotone compaction: stack the segment buffers
    side by side, keep only each segment's selected columns, and pack
    left — ONE walk over the stacked width instead of one log-shift pass
    stack per segment (the round-2 formulation cost ~16 ms of the srans2
    encode at [256, 156K]; the single compact is ~1 ms).
    """
    B = segments[0][0].shape[0]
    bufs, keeps = [], []
    total_len = jnp.zeros((B,), dtype=jnp.int32)
    for buf, sel in segments:
        Mi = buf.shape[1]
        sel = jnp.asarray(sel)
        if sel.ndim == 2:  # sparse: explicit keep mask
            keep = sel
            total_len = total_len + jnp.sum(keep.astype(jnp.int32), axis=1)
        else:
            ln = jnp.broadcast_to(sel.astype(jnp.int32), (B,))
            cols = jnp.arange(Mi, dtype=jnp.int32)[None, :]
            keep = cols < ln[:, None]
            total_len = total_len + ln
        bufs.append(jnp.where(keep, buf, 0))
        keeps.append(keep)
    cat = jnp.concatenate(bufs, axis=1)
    keep = jnp.concatenate(keeps, axis=1)
    out, _ = monotone_compact(cat, keep)
    W = out.shape[1]
    if W < total_cols:
        out = jnp.pad(out, ((0, 0), (0, total_cols - W)))
    return out[:, :total_cols], total_len
