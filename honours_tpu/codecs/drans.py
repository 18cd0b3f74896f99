"""drans_vbbe21_zd — self-contained dynamic order-1 rANS (format v5).

Answers the held-out weakness of the canned-table flagships: the stream
carries its own model with ZERO table bytes.  Lane-grid steps
t < ceil(S/4) are coded with the canned o1 table; a bucketed order-1
histogram of those prefix symbols (tables/drans.py) is fitted
identically by encoder and decoder, and steps t >= ceil(S/4) are coded
with the fitted table.  In-sample == held-out by construction.

Reference precedents: dynamic Huffman builds its model from the data
being coded (press/huffman/huffman.c:373-424); the adaptive range
coders (rcmsenc, press/press.c:6531+) update their model per byte.
drans does one mid-stream update at a format-defined boundary so both
sides stay lane-parallel on TPU.

Stream framing:
[G:u16 LE][zd0:u16][vbbe21 exception block][v5 body].

The BATCH is the compression unit: `drans_press_reads` fits ONE table
over the prefixes of all reads passed together, and
`drans_depress_reads` must receive the same grouping.  The G header
makes mismatched groupings fail LOUDLY instead of decoding garbage
(ADVICE r4 item 2): G = the number of streams in the encode group with
a non-empty rANS body (S > 0); the decoder recomputes the same count
over its own group and refuses to decode on mismatch.  The registry
codec presses/depresses single reads (a batch of one, G <= 1), which is
always self-consistent.
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.kernels.rans import (
    K_SHARED,
    o1_dyn_decode_finish,
    o1_dyn_decode_start,
    o1_grid,
    rans_bound,
    rans_encode_o1_dyn,
)
from honours_tpu.tables.drans import fit_freqs, prefix_counts_grid, prefix_steps
from honours_tpu.tables.o1 import canned_o1_freqs
from honours_tpu.transforms.core import unzigdelta, zigdelta


def drans_press_reads(signals) -> list:
    """Compress a batch of int16 reads with one shared fitted table."""
    canned = canned_o1_freqs()
    pre = []
    counts = None
    for sig in signals:
        zd = zigdelta(np.asarray(sig, dtype=np.int16))
        vb = PAYLOAD["vbbe21"][0](zd[1:])
        exlen = exblock_len(vb, 0, "vbbe21")
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        grid, _, S = o1_grid(data)
        c = prefix_counts_grid(grid, data.size, S)
        counts = c if counts is None else counts + c
        pre.append((zd, vb, exlen, data, S))
    fitted = fit_freqs(counts)
    G = sum(1 for _, _, _, _, S in pre if S > 0)
    out = []
    for zd, vb, exlen, data, S in pre:
        body = rans_encode_o1_dyn(data, canned, fitted, prefix_steps(S), S=S)
        out.append(
            struct.pack("<H", G)
            + zd[:1].astype("<u2").tobytes()
            + vb[:exlen]
            + body
        )
    return out


def drans_depress_reads(streams, nins) -> list:
    """Decompress a batch pressed together by drans_press_reads.

    Raises ValueError when a stream's G header disagrees with this
    group's non-empty-body count — the loud-failure contract for
    mismatched encode/decode groupings."""
    canned = canned_o1_freqs()
    sts = []
    counts = None
    for stream, nin in zip(streams, nins):
        (g_hdr,) = struct.unpack_from("<H", stream, 0)
        exlen = exblock_len(stream, 4, "vbbe21")
        (nex,) = struct.unpack_from("<I", stream, 4)
        ndata = nin - 1 - nex
        body = stream[4 + exlen :]
        S = int(np.frombuffer(body, dtype="<u4", count=1)[0])
        st = o1_dyn_decode_start(body, ndata, canned, prefix_steps(S))
        grid = st["out"].reshape(K_SHARED, max(S, 1))[:, :S].astype(np.int64)
        c = prefix_counts_grid(grid, ndata, S)
        counts = c if counts is None else counts + c
        sts.append((st, stream, exlen, nex, nin, S, g_hdr))
    g_expected = sum(1 for t in sts if t[5] > 0)
    for i, t in enumerate(sts):
        if t[5] > 0 and t[6] != g_expected:
            raise ValueError(
                f"drans group mismatch: stream {i} was encoded in a group "
                f"of {t[6]} non-empty streams but is being decoded in a "
                f"group of {g_expected}; pass the original grouping"
            )
    fitted = fit_freqs(counts)
    out = []
    for st, stream, exlen, nex, nin, S, _g in sts:
        data = o1_dyn_decode_finish(st, fitted, prefix_steps(S))
        vb = stream[4 : 4 + exlen] + data.tobytes()
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1, offset=2)[0]
        zd[1:] = PAYLOAD["vbbe21"][1](vb, nin - 1)
        out.append(unzigdelta(zd))
    return out


def drans_depress_auto(streams, nins, max_b: int = 256) -> list:
    """Decode drans streams with UNKNOWN grouping, in original order.

    Streams written per-read (G <= 1, e.g. the registry codec) decode
    individually; engine-written streams (G = bucket group size) are
    regrouped by re-deriving the runner's deterministic length bucketing
    (io/batching.bucket_reads with the same max_b).  Mixed files — e.g.
    exception-cap host fallbacks inside an engine bucket — partition by
    each stream's own G header; drans_depress_reads still validates
    every group, so a wrong grouping stays a loud ValueError."""
    import struct as _struct

    from honours_tpu.io.batching import bucket_reads, restore_order

    fake = [np.zeros(int(m), np.int16) for m in nins]
    buckets = bucket_reads(fake, max_b=max_b)
    outs = []
    for b in buckets:
        rows = [streams[i] for i in b.indices]
        lens = [int(nins[i]) for i in b.indices]
        gs = [_struct.unpack_from("<H", r, 0)[0] for r in rows]
        single = [j for j in range(len(rows)) if gs[j] <= 1]
        grouped = [j for j in range(len(rows)) if gs[j] > 1]
        dec = [None] * len(rows)
        for j in single:
            dec[j] = drans_depress_reads([rows[j]], [lens[j]])[0]
        if grouped:
            outs_g = drans_depress_reads(
                [rows[j] for j in grouped], [lens[j] for j in grouped]
            )
            for j, o in zip(grouped, outs_g):
                dec[j] = o
        outs.append(dec)
    return restore_order(buckets, outs)


class DransVbbe21ZdCodec(Codec):
    name = "drans_vbbe21_zd"
    #: the batch is the compression unit — io/blow5 and other whole-file
    #: consumers should decode via depress_group, not per-read depress
    grouped = True

    def bound(self, nin: int) -> int:
        return 2 + 2 + 4 + rans_bound(2 * nin)

    def press(self, signal):
        return drans_press_reads([signal])[0]

    def depress(self, stream, nin):
        return drans_depress_reads([stream], [nin])[0]

    def depress_group(self, streams, nins):
        return drans_depress_auto(streams, nins)


register(DransVbbe21ZdCodec())
