"""dstall_drans — stall-aware SELF-CONTAINED flagship (drans branches).

The reference's best overall method is dstall-fz at ratio 2.9917
(press/press.c:7986-8030, data/reads.blow5.test:36): split each read at
its capture stall, code the two pieces with adaptive coders that need no
training corpus, min-pick against the unsplit encoding
(press/press.c:8003-8019).  This codec is the TPU-native analogue with
drans (format v5, codecs/drans.py) as the branch coder: every branch
stream carries its own model with zero table bytes, so the whole method
is self-contained — in-sample == held-out by construction, the same
no-training-data rules the reference's dstall-fz plays by.

Min-pick under shared fits: drans fits one model per encode GROUP, so a
size-based pick makes membership depend on sizes which depend on fits
which depend on membership.  The knot is cut with a TRIAL + FINAL
protocol: a trial pass encodes the plain branch over all reads and the
stall/nonstall branches over the segmented reads, the pick per read is
frozen from the trial sizes, and branch groups whose membership changed
are re-encoded with final (= flag-recomputable) membership.  The
decoder derives every group from the flag bytes alone; the G headers
inside each branch blob still make wrong groupings fail loudly.

Measured behavior (tests/test_dstall_drans.py): on real nanopore signal
the split branch essentially never wins — the reference's dstall trick
pays off for its ADAPTIVE coder (separating the stall keeps its model
clean) but drans's fitted model is global, so splitting only costs blob
framing plus a second lane restart.  The min-pick therefore keeps
dstall_drans within 5 bytes/read of drans itself on stall-light data,
and the split engages (and wins) only where stalls dominate the read.

Stream format (same layout as dstall_srans2, codecs/dstall.py):
  [exists:1B]
  exists=1: [start:u16][length:u16][stall_len:u32][stall drans blob]
            [ns_len:u32][nonstall drans blob]
  exists=0: [plain_len:u32][plain drans blob]

Like drans itself, the BATCH is the compression unit: press_reads fits
one table per branch group; depress_reads must receive the same
grouping.
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.drans import drans_depress_reads, drans_press_reads
from honours_tpu.codecs.dstall import _split
from honours_tpu.kernels.rans import rans_bound

#: framing bytes a split stream pays beyond its two blobs / plain beyond one
SPLIT_OVERHEAD = 1 + 2 + 2 + 4 + 4
PLAIN_OVERHEAD = 1 + 4


def _segments(x, info):
    _, start, length = info
    return (
        x[start : start + length],
        np.concatenate([x[:start], x[start + length :]]),
    )


def dstall_drans_press_reads(signals) -> list:
    """Compress a batch of int16 reads; one shared fit per branch group,
    per-read min-pick frozen from the trial pass."""
    xs = [np.asarray(s, dtype=np.int16) for s in signals]
    info = [_split(x) for x in xs]
    stall_i = [i for i, (ex, _, _) in enumerate(info) if ex]

    # trial pass: plain over ALL reads, branches over the segmented reads
    plain = drans_press_reads(xs)
    stall_blobs = ns_blobs = []
    if stall_i:
        segs = [_segments(xs[i], info[i]) for i in stall_i]
        stall_blobs = drans_press_reads([s for s, _ in segs])
        ns_blobs = drans_press_reads([n for _, n in segs])

    pick_split = [False] * len(xs)
    for j, i in enumerate(stall_i):
        split_sz = SPLIT_OVERHEAD + len(stall_blobs[j]) + len(ns_blobs[j])
        pick_split[i] = split_sz < PLAIN_OVERHEAD + len(plain[i])

    # final pass: re-encode any branch group whose membership changed
    plain_i = [i for i in range(len(xs)) if not pick_split[i]]
    split_i = [i for i in range(len(xs)) if pick_split[i]]
    if plain_i != list(range(len(xs))):
        fin = drans_press_reads([xs[i] for i in plain_i]) if plain_i else []
        plain = {i: b for i, b in zip(plain_i, fin)}
    if split_i != stall_i:
        segs = [_segments(xs[i], info[i]) for i in split_i]
        sb = drans_press_reads([s for s, _ in segs]) if split_i else []
        nb = drans_press_reads([n for _, n in segs]) if split_i else []
        stall_blobs = {i: b for i, b in zip(split_i, sb)}
        ns_blobs = {i: b for i, b in zip(split_i, nb)}
    else:
        stall_blobs = {i: b for i, b in zip(stall_i, stall_blobs)}
        ns_blobs = {i: b for i, b in zip(stall_i, ns_blobs)}

    out = [None] * len(xs)
    for i in plain_i:
        out[i] = b"\x00" + struct.pack("<I", len(plain[i])) + plain[i]
    for i in split_i:
        _, start, length = info[i]
        out[i] = (
            b"\x01"
            + struct.pack("<HHI", start, length, len(stall_blobs[i]))
            + stall_blobs[i]
            + struct.pack("<I", len(ns_blobs[i]))
            + ns_blobs[i]
        )
    return out


def dstall_drans_depress_reads(streams, nins) -> list:
    """Decompress a batch pressed together by dstall_drans_press_reads."""
    parts = []  # (flag, start, length, stall_blob|None, ns_or_plain_blob)
    for stream in streams:
        if stream[0]:
            start, length, stall_len = struct.unpack_from("<HHI", stream, 1)
            off = 9 + stall_len
            (ns_len,) = struct.unpack_from("<I", stream, off)
            parts.append(
                (
                    True,
                    start,
                    length,
                    bytes(stream[9 : 9 + stall_len]),
                    bytes(stream[off + 4 : off + 4 + ns_len]),
                )
            )
        else:
            (plain_len,) = struct.unpack_from("<I", stream, 1)
            parts.append((False, 0, 0, None, bytes(stream[5 : 5 + plain_len])))
    plain_i = [i for i, p in enumerate(parts) if not p[0]]
    split_i = [i for i, p in enumerate(parts) if p[0]]
    out = [None] * len(parts)
    if plain_i:
        dec = drans_depress_reads(
            [parts[i][4] for i in plain_i], [nins[i] for i in plain_i]
        )
        for i, d in zip(plain_i, dec):
            out[i] = d
    if split_i:
        stalls = drans_depress_reads(
            [parts[i][3] for i in split_i], [parts[i][2] for i in split_i]
        )
        nss = drans_depress_reads(
            [parts[i][4] for i in split_i],
            [nins[i] - parts[i][2] for i in split_i],
        )
        for i, st, ns in zip(split_i, stalls, nss):
            _, start, length, _, _ = parts[i]
            o = np.empty(nins[i], dtype=np.int16)
            o[start : start + length] = st
            o[:start] = ns[:start]
            o[start + length :] = ns[start:]
            out[i] = o
    return out


def _gmax(stream) -> int:
    """Largest branch-blob G header in a dstall_drans stream."""
    if stream[0]:
        _, _, stall_len = struct.unpack_from("<HHI", stream, 1)
        g1 = struct.unpack_from("<H", stream, 9)[0] if stall_len >= 2 else 0
        off = 9 + stall_len
        (ns_len,) = struct.unpack_from("<I", stream, off)
        g2 = (
            struct.unpack_from("<H", stream, off + 4)[0]
            if ns_len >= 2
            else 0
        )
        return max(g1, g2)
    return struct.unpack_from("<H", stream, 5)[0]


def dstall_drans_depress_auto(streams, nins, max_b: int = 256) -> list:
    """Decode with UNKNOWN grouping by re-deriving the runner's
    deterministic length bucketing (mirrors drans_depress_auto); streams
    whose branch blobs carry G <= 1 decode individually."""
    from honours_tpu.io.batching import bucket_reads, restore_order

    fake = [np.zeros(int(m), np.int16) for m in nins]
    buckets = bucket_reads(fake, max_b=max_b)
    outs = []
    for b in buckets:
        rows = [streams[i] for i in b.indices]
        lens = [int(nins[i]) for i in b.indices]
        single = [j for j in range(len(rows)) if _gmax(rows[j]) <= 1]
        grouped = [j for j in range(len(rows)) if _gmax(rows[j]) > 1]
        dec = [None] * len(rows)
        for j in single:
            dec[j] = dstall_drans_depress_reads([rows[j]], [lens[j]])[0]
        if grouped:
            outs_g = dstall_drans_depress_reads(
                [rows[j] for j in grouped], [lens[j] for j in grouped]
            )
            for j, o in zip(grouped, outs_g):
                dec[j] = o
        outs.append(dec)
    return restore_order(buckets, outs)


class DstallDransCodec(Codec):
    name = "dstall_drans"
    #: the batch is the compression unit — decode whole files via
    #: depress_group (same contract as drans_vbbe21_zd)
    grouped = True

    def bound(self, nin: int) -> int:
        return 32 + 2 * (2 + 2 + 4 + rans_bound(2 * nin))

    def press(self, signal):
        return dstall_drans_press_reads([signal])[0]

    def depress(self, stream, nin):
        return dstall_drans_depress_reads([stream], [nin])[0]

    def depress_group(self, streams, nins):
        return dstall_drans_depress_auto(streams, nins)


register(DstallDransCodec())
