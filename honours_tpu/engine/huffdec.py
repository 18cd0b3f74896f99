"""Chunked TPU Huffman decode (the shuffman_* depress side).

The reference decodes Huffman serially, one bit at a time through the
code tree (press/huffman/huffman.c:1219-1264).  A Huffman bit stream
has no alignment markers, so parallel decode must recover the chunk
entry points itself.  Classic three-phase scheme:

1. SPECULATE: split each read's bit stream into C-bit chunks; for every
   chunk and every possible entry offset d in [0, maxlen) (the bits of
   a boundary-crossing codeword still owed to the previous chunk),
   walk the chunk with the length LUT only, producing the exit offset
   into the next chunk and the symbol count.  All (chunk, d) walks run
   as one flat lane dimension — embarrassingly parallel.
2. COMPOSE: the per-chunk [maxlen] transition vectors compose by
   gather; a prefix scan over chunks yields every chunk's TRUE entry
   offset (chunk 0 enters at 0).  This is exact, not heuristic.
3. DECODE: one aligned walk per chunk emits symbols; per-chunk counts
   prefix-sum into output offsets and a monotone compaction restores
   the linear symbol stream.

Byte-equal with native/huffdec.c (ht_huffman_decode) and hence with the
reference's tree walk.  Throughput note: every walk step is a gather
into the 2^maxlen LUT, which TPUs execute at ~1e8/s — the measured
chunked decoder is documented in COVERAGE as slower than the native
host LUT path, which therefore stays the production default
(engine/runner.py keeps its explicit host-decode notice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np



@functools.partial(jax.jit, static_argnames=("C", "width", "maxsym"))
def _speculate(chunks, len_lut, C: int, width: int, maxsym: int):
    """chunks [NL, Cb+4] u8 (chunk bytes + 4 spill bytes) ->
    exit offset [NL, width] i32 and symbol count [NL, width] i32 for
    every entry offset d."""
    NL = chunks.shape[0]
    w32 = chunks.astype(jnp.uint32)

    pos0 = jnp.tile(jnp.arange(width, dtype=jnp.int32)[None, :], (NL, 1))
    pos = pos0.reshape(-1)  # [NL*width]
    cnt = jnp.zeros_like(pos)
    w32f = jnp.repeat(w32, width, axis=0)

    def wmany(p):
        byt = p >> 3
        sh = p & 7
        i = jnp.arange(4, dtype=jnp.int32)[None, :]
        idx = jnp.clip(byt[:, None] + i, 0, chunks.shape[1] - 1)
        b = jnp.take_along_axis(w32f, idx, axis=1)
        word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
        return (word >> sh.astype(jnp.uint32)) & jnp.uint32((1 << width) - 1)

    def body(_, carry):
        pos, cnt = carry
        active = pos < C
        ln = jnp.take(len_lut, wmany(pos).astype(jnp.int32)).astype(jnp.int32)
        pos = jnp.where(active, pos + ln, pos)
        cnt = jnp.where(active, cnt + 1, cnt)
        return pos, cnt

    pos, cnt = jax.lax.fori_loop(0, maxsym, body, (pos, cnt))
    return (pos.reshape(NL, width) - C), cnt.reshape(NL, width)


def _compose_entries(exits_np, counts_np, nchunks_per_read, width):
    """Host prefix composition (tiny): true entry offset + symbol start
    per chunk, per read."""
    entries = np.zeros(exits_np.shape[0], np.int64)
    starts = np.zeros(exits_np.shape[0], np.int64)
    base = 0
    for nc in nchunks_per_read:
        e = 0
        s = 0
        for j in range(nc):
            entries[base + j] = e
            starts[base + j] = s
            s += counts_np[base + j, e]
            e = exits_np[base + j, e]
        base += nc
    return entries, starts


@functools.partial(jax.jit, static_argnames=("C", "width", "maxsym"))
def _decode_aligned(chunks, entries, sym_lut, len_lut, C: int, width: int,
                    maxsym: int):
    """Aligned walk: emits up to maxsym symbols per chunk + the count."""
    NL = chunks.shape[0]
    w32 = chunks.astype(jnp.uint32)

    def wmany(p):
        byt = p >> 3
        sh = p & 7
        i = jnp.arange(4, dtype=jnp.int32)[None, :]
        idx = jnp.clip(byt[:, None] + i, 0, chunks.shape[1] - 1)
        b = jnp.take_along_axis(w32, idx, axis=1)
        word = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16) | (b[:, 3] << 24)
        return (word >> sh.astype(jnp.uint32)) & jnp.uint32((1 << width) - 1)

    def body(t, carry):
        pos, cnt, out = carry
        active = pos < C
        w = wmany(pos).astype(jnp.int32)
        sym = jnp.take(sym_lut, w).astype(jnp.uint8)
        ln = jnp.take(len_lut, w).astype(jnp.int32)
        out = jax.lax.dynamic_update_slice(
            out, jnp.where(active, sym, 0)[:, None], (0, t)
        )
        pos = jnp.where(active, pos + ln, pos)
        cnt = jnp.where(active, cnt + 1, cnt)
        return pos, cnt, out

    out = jnp.zeros((NL, maxsym), jnp.uint8)
    pos, cnt, out = jax.lax.fori_loop(
        0, maxsym, body, (entries, jnp.zeros((NL,), jnp.int32), out)
    )
    return out, cnt


def huffman_decode_tpu(streams, ns, table, C_bits: int = 1024):
    """Decode LSB-first Huffman bit streams on device.

    streams: list of bytes (payload bit streams, no headers);
    ns: symbols per stream; table: tables.huffman.HuffmanTable.
    Returns list of np.uint8 arrays.  Byte-equal with
    kernels.huffman_np.huffman_decode (native LUT walk).
    """
    from honours_tpu.kernels.huffman_np import make_decode_lut

    width = int(table.max_len)
    assert 0 < width <= 24
    luts = getattr(table, "_decode_lut", None)
    if luts is None:
        luts = make_decode_lut(table)
        table._decode_lut = luts
    sym_lut, len_lut = luts
    sym_j = jnp.asarray(sym_lut)
    len_j = jnp.asarray(len_lut)

    Cb = C_bits // 8
    minlen = int(table.lengths[table.lengths > 0].min())
    maxsym = C_bits // minlen

    # build the flat chunk matrix (+4 spill bytes from the next chunk)
    rows = []
    nchunks = []
    for s in streams:
        buf = np.frombuffer(s, np.uint8)
        nc = max(1, -(-buf.size // Cb))
        pad = np.zeros(nc * Cb + 4, np.uint8)
        pad[: buf.size] = buf
        view = np.stack([pad[i * Cb : i * Cb + Cb + 4] for i in range(nc)])
        rows.append(view)
        nchunks.append(nc)
    chunks = jnp.asarray(np.concatenate(rows, axis=0))

    exits, counts = _speculate(chunks, len_j, C_bits, width, maxsym)
    exits_np = np.asarray(exits)
    counts_np = np.asarray(counts)
    entries, starts = _compose_entries(exits_np, counts_np, nchunks, width)

    out, cnt = _decode_aligned(
        chunks, jnp.asarray(entries.astype(np.int32)), sym_j, len_j,
        C_bits, width, maxsym,
    )
    # compact each chunk's cnt symbols, then split per read (host —
    # the result is being returned to the host anyway)
    out_np = np.asarray(out)
    cnt_np = np.asarray(cnt)
    mask = np.arange(maxsym)[None, :] < cnt_np[:, None]
    flat = out_np[mask]
    outs = []
    base_syms = 0
    base_chunk = 0
    for nc, n in zip(nchunks, ns):
        # total symbols this read's chunks emitted (trailing padding
        # bits decode garbage past n; the caller's n truncates it)
        last = base_chunk + nc - 1
        decoded = int(starts[last]) + int(counts_np[last, entries[last]])
        assert decoded >= n, (decoded, n)
        outs.append(flat[base_syms : base_syms + n].copy())
        base_syms += decoded
        base_chunk += nc
    return outs
