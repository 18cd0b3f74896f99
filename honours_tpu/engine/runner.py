"""Bucketed TPU execution of whole read sets through the batched engines.

The user-facing path (SURVEY §7.1 item 6, VERDICT r1 item 3): reads are
grouped into power-of-two padded buckets (io/batching.py), each bucket
runs the jitted batched engine for the selected codec, and per-read
streams come back in original order, byte-identical to the serial host
codec — so files written through this path decode anywhere.

Exception-cap handling: the engines statically cap per-read exception
buffers at emax = L/16 (real nanopore zd data has ~1% exceptions; the
cap shrinks every buffer-width-bound stage).  The vbbe21 exception count
is exact in the stream header even when the cap overflows, so rows with
nex > emax are detected from their own bytes and transparently
re-encoded (or decoded) by the serial host codec.
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu.codecs import base as registry
from honours_tpu.io.batching import bucket_reads, restore_order

#: codecs with a batched engine (encode, decode); decode None = host-only
ENGINE_CODECS = {
    "drans_vbbe21_zd": ("drans", "drans"),
    "srans2_vbbe21_zd": ("srans2", "srans2"),
    "srans3_vbbe21_zd": ("srans3", "srans3"),
    "srans_vbbe21_zd": ("srans", "srans"),
    "shuffman_vbbe21_zd": ("shuff", None),
    "svb12_zd": ("svb16_zd", "svb16_zd"),
    "svb12": ("svb16", "svb16"),
    "vb1e2_zd": ("vb_zd:vb1e2", "vb_zd:vb1e2"),
    "vbe21_zd": ("vb_zd:vbe21", "vb_zd:vbe21"),
    "vbbe21_zd": ("vb_zd:vbbe21", "vb_zd:vbbe21"),
    "vbsbe21_zd": ("vb_zd:vbsbe21", "vb_zd:vbsbe21"),
    "vbsse21_zd": ("vb_zd:vbsse21", "vb_zd:vbsse21"),
    "svb_zd": ("svb32_zd:1234", "svb32_zd:1234"),
    "svb0124_zd": ("svb32_zd:0124", "svb32_zd:0124"),
    "hasgam_vbsse21_zdq": ("exzd", "exzd"),
    "dstall_srans2": ("dstall", "dstall"),
    "dstall_drans": ("dstall_drans", "dstall_drans"),
    "rice_vbe21_zd": ("rice_zd:vbe21", None),
    "rice_vbbe21_zd": ("rice_zd:vbbe21", None),
    "rice_vbsbe21_zd": ("rice_zd:vbsbe21", None),
    "rice_vbsse21_zd": ("rice_zd:vbsse21", None),
}

#: why the decode-side engine is None for the encode-only methods above
HOST_DECODE_REASON = {
    "shuffman_vbbe21_zd": "serial per-bit Huffman tree walk "
    "(press/huffman/huffman.c:1219-1264); srans2 supersedes shuff on "
    "both ratio and symmetry — see COVERAGE.md item 6",
    "rice_vbe21_zd": "one serial bit stream per read with data-dependent "
    "record lengths; no lane interleaving to vectorize over",
    "rice_vbbe21_zd": "see rice_vbe21_zd",
    "rice_vbsbe21_zd": "see rice_vbe21_zd",
    "rice_vbsse21_zd": "see rice_vbe21_zd",
}
_NOTICED: set = set()


def engine_codec_names():
    return sorted(ENGINE_CODECS)


def _emax(L: int) -> int:
    return max(64, L // 16)


def _pad_rows(sig, n, mult: int = 8):
    """Pad the batch to a row-count multiple (Pallas kernels want B % 8)."""
    B = sig.shape[0]
    Bp = -(-B // mult) * mult
    if Bp == B:
        return sig, n, B
    sigp = np.zeros((Bp, sig.shape[1]), sig.dtype)
    sigp[:B] = sig
    np_ = np.zeros(Bp, n.dtype)
    np_[:B] = n
    return sigp, np_, B


def _press_bucket(sig, n, kind: str):
    import jax.numpy as jnp

    from honours_tpu.engine.pipeline import (
        canned_huffman_tables,
        canned_o1_device_tables,
        canned_rans_tables,
        press_shuff_batch,
        press_srans2_batch,
        press_srans_batch,
    )
    from honours_tpu.engine.svb16 import svb16_encode_batch

    L = sig.shape[1]
    sigj, nj = jnp.asarray(sig), jnp.asarray(n)
    if kind == "srans2":
        st, sl = press_srans2_batch(sigj, nj, canned_o1_device_tables(), _emax(L))
    elif kind == "drans":
        from honours_tpu.engine.drans import press_drans_batch

        st, sl = press_drans_batch(sigj, nj, canned_o1_device_tables(),
                                   _emax(L))
    elif kind == "srans3":
        from honours_tpu.engine.pipeline import (
            canned_o1n_device_tables,
            press_srans3_batch,
        )

        st, sl = press_srans3_batch(
            sigj, nj, canned_o1n_device_tables(), _emax(L)
        )
    elif kind == "srans":
        freqs, cum = canned_rans_tables()
        st, sl = press_srans_batch(sigj, nj, freqs, cum, _emax(L))
    elif kind == "shuff":
        lengths, codes = canned_huffman_tables()
        st, sl = press_shuff_batch(sigj, nj, lengths, codes)
    elif kind in ("svb16_zd", "svb16"):
        st, sl = svb16_encode_batch(sigj, nj, zd=(kind == "svb16_zd"))
    elif kind.startswith("vb_zd:"):
        from honours_tpu.engine.vb_batch import press_vb_zd_batch

        st, sl = press_vb_zd_batch(sigj, nj, kind.split(":")[1], _emax(L))
    elif kind.startswith("svb32_zd:"):
        from honours_tpu.engine.vb_batch import press_svb_zd_batch

        st, sl = press_svb_zd_batch(sigj, nj, kind.split(":")[1])
    elif kind == "exzd":
        from honours_tpu.engine.exzd import press_exzd_batch

        st, sl = press_exzd_batch(sigj, nj, _emax(L))
    elif kind == "dstall":
        from honours_tpu.engine.dstall import press_dstall_batch

        st, sl = press_dstall_batch(sigj, nj, canned_o1_device_tables(),
                                    _emax(L))
    elif kind == "dstall_drans":
        from honours_tpu.engine.dstall_drans import press_dstall_drans_batch

        st, sl = press_dstall_drans_batch(sigj, nj,
                                          canned_o1_device_tables(),
                                          _emax(L))
    elif kind.startswith("rice_zd:"):
        from honours_tpu.engine.rice import press_rice_vb_zd_batch

        st, sl = press_rice_vb_zd_batch(sigj, nj, kind.split(":")[1], _emax(L))
    else:
        raise KeyError(kind)
    return np.asarray(st), np.asarray(sl)


def _depress_bucket(buf, n, kind: str, L: int):
    import jax.numpy as jnp

    from honours_tpu.engine.pipeline import (
        canned_o1_device_tables,
        canned_rans_tables,
        depress_srans2_batch,
        depress_srans_batch,
    )
    from honours_tpu.engine.svb16 import svb16_decode_batch

    bufj, nj = jnp.asarray(buf), jnp.asarray(n)
    if kind == "srans2":
        out = depress_srans2_batch(bufj, nj, canned_o1_device_tables(), L,
                                   emax=_emax(L))
    elif kind == "drans":
        from honours_tpu.engine.drans import depress_drans_batch

        out = depress_drans_batch(bufj, nj, canned_o1_device_tables(), L,
                                  emax=_emax(L))
    elif kind == "srans3":
        from honours_tpu.engine.pipeline import (
            canned_o1n_device_tables,
            depress_srans3_batch,
        )

        out = depress_srans3_batch(
            bufj, nj, canned_o1n_device_tables(), L, emax=_emax(L)
        )
    elif kind == "srans":
        freqs, cum = canned_rans_tables()
        out = depress_srans_batch(bufj, nj, freqs, cum, L, emax=_emax(L))
    elif kind in ("svb16_zd", "svb16"):
        out = svb16_decode_batch(bufj, nj, L, zd=(kind == "svb16_zd"))
    elif kind.startswith("vb_zd:"):
        from honours_tpu.engine.vb_batch import depress_vb_zd_batch

        out = depress_vb_zd_batch(bufj, nj, kind.split(":")[1], L, _emax(L))
    elif kind.startswith("svb32_zd:"):
        from honours_tpu.engine.vb_batch import depress_svb_zd_batch

        out = depress_svb_zd_batch(bufj, nj, L, kind.split(":")[1])
    elif kind == "exzd":
        from honours_tpu.engine.exzd import depress_exzd_batch

        out = depress_exzd_batch(bufj, nj, L, _emax(L))
    elif kind == "dstall":
        from honours_tpu.engine.dstall import depress_dstall_batch

        out = depress_dstall_batch(bufj, nj, canned_o1_device_tables(), L,
                                   _emax(L))
    elif kind == "dstall_drans":
        from honours_tpu.engine.dstall_drans import (
            depress_dstall_drans_batch,
        )

        out = depress_dstall_drans_batch(bufj, nj,
                                         canned_o1_device_tables(), L,
                                         _emax(L))
    else:
        raise KeyError(kind)
    return np.asarray(out)


def _nex_overflowed(blob: bytes, codec_name: str, emax: int) -> bool:
    """vb-exception-family streams carry the exact exception count at
    bytes [2:6] (press/press.c:2780 framing: [zd0:u16][nex:u32]...),
    valid even when the engine's capped buffers overflowed — use it as
    the fallback trigger.  ex-zd carries it at byte 12 instead
    ([ver:1][nin:u64][q:1][zd0:u16][nex:u32], press/ex_zd.c:403-457).
    svb streams have no exception cap."""
    if codec_name == "hasgam_vbsse21_zdq":
        if len(blob) < 16:
            return False
        (nex,) = struct.unpack_from("<I", blob, 12)
        return nex > emax
    if codec_name == "drans_vbbe21_zd":
        # [G:u16][zd0:u16][nex:u32]... (codecs/drans.py framing)
        if len(blob) < 8:
            return False
        (nex,) = struct.unpack_from("<I", blob, 4)
        return nex > emax
    if codec_name == "dstall_drans":
        # inner drans blobs carry [G:u16][zd0:u16][nex:u32]
        if len(blob) < 13:
            return False
        if blob[0]:
            (stall_len,) = struct.unpack_from("<I", blob, 5)
            (nex_s,) = struct.unpack_from("<I", blob, 13)
            ns_off = 9 + stall_len + 4
            if len(blob) < ns_off + 8:
                return True  # malformed for the cap -> host path
            (nex_n,) = struct.unpack_from("<I", blob, ns_off + 4)
            return nex_s > emax or nex_n > emax
        (nex,) = struct.unpack_from("<I", blob, 9)
        return nex > emax
    if codec_name == "dstall_srans2":
        # both inner srans2 blobs carry their vbbe21 nex at blob+2
        if len(blob) < 11:
            return False
        if blob[0]:
            (stall_len,) = struct.unpack_from("<I", blob, 5)
            (nex_s,) = struct.unpack_from("<I", blob, 11)
            ns_off = 9 + stall_len + 4
            if len(blob) < ns_off + 6:
                return True  # malformed for the cap -> host path
            (nex_n,) = struct.unpack_from("<I", blob, ns_off + 2)
            return nex_s > emax or nex_n > emax
        (nex_n,) = struct.unpack_from("<I", blob, 7)
        return nex_n > emax
    if len(blob) < 6 or not any(
        k in codec_name for k in ("vb1e2", "vbe21", "vbbe21", "vbsbe21", "vbsse21")
    ):
        return False
    (nex,) = struct.unpack_from("<I", blob, 2)
    return nex > emax


def press_signals_tpu(signals, codec_name: str, max_b: int = 256):
    """Compress reads through the batched engines -> list[bytes] in
    original order, byte-identical to registry.get(codec_name).press."""
    kind = ENGINE_CODECS.get(codec_name, (None, None))[0]
    host = registry.get(codec_name)
    if kind is None:  # no engine: serial host path
        return [host.press(np.asarray(s, np.int16)) for s in signals]
    buckets = bucket_reads(signals, max_b=max_b)
    outs = []
    for b in buckets:
        sig, n, B = _pad_rows(b.sig, b.n)
        st, sl = _press_bucket(sig, n, kind)
        emax = _emax(b.L)
        rows = []
        for i in range(B):
            blob = st[i, : sl[i]].tobytes()
            if _nex_overflowed(blob, codec_name, emax):
                blob = host.press(b.sig[i, : b.n[i]])
            rows.append(blob)
        outs.append(rows)
    return restore_order(buckets, outs)


def depress_signals_tpu(streams, lengths, codec_name: str, max_b: int = 256):
    """Decode per-read streams (any source with this codec's format) ->
    list of int16 arrays in original order."""
    kind = ENGINE_CODECS.get(codec_name, (None, None))[1]
    host = registry.get(codec_name)
    if kind is None:
        if codec_name in HOST_DECODE_REASON and codec_name not in _NOTICED:
            import sys

            _NOTICED.add(codec_name)
            print(
                f"note: {codec_name} decode runs on the host codec "
                f"(TPU path is encode-only: "
                f"{HOST_DECODE_REASON[codec_name]})",
                file=sys.stderr,
            )
        return [host.depress(s, int(m)) for s, m in zip(streams, lengths)]
    # bucket by signal length (decode shapes key on L)
    fake = [np.zeros(int(m), np.int16) for m in lengths]
    buckets = bucket_reads(fake, max_b=max_b)
    outs = []
    for b in buckets:
        emax = _emax(b.L)
        rows = [streams[i] for i in b.indices]
        host_rows = {}
        for j, blob in enumerate(rows):
            if _nex_overflowed(blob, codec_name, emax):
                host_rows[j] = host.depress(blob, int(b.n[j]))
            elif (
                codec_name == "drans_vbbe21_zd"
                and len(blob) >= 2
                and struct.unpack_from("<H", blob, 0)[0] <= 1
            ):
                # per-read (host-written) drans streams are their own
                # groups — decode them individually; the engine batch
                # group-decodes only the engine-written rows
                host_rows[j] = host.depress(blob, int(b.n[j]))
            elif codec_name == "dstall_drans":
                from honours_tpu.codecs.dstall_drans import _gmax

                if _gmax(blob) <= 1:
                    # same per-read-group rule for the stall-aware
                    # flagship's branch blobs
                    host_rows[j] = host.depress(blob, int(b.n[j]))
        W = max(len(r) for r in rows)
        W = -(-W // 128) * 128
        buf = np.zeros((len(rows), W), np.uint8)
        for j, blob in enumerate(rows):
            if j in host_rows:
                # leave the row zeroed: overflow streams were excluded
                # from group state at encode (drans fit/G), and a zero
                # row parses as empty, keeping the engine batch's group
                # membership identical to the encoder's
                continue
            buf[j, : len(blob)] = np.frombuffer(blob, np.uint8)
        buf, n, B = _pad_rows(buf, b.n)
        out = _depress_bucket(buf, n, kind, b.L)
        dec = []
        for j in range(B):
            if j in host_rows:
                dec.append(np.asarray(host_rows[j], np.int16))
            else:
                dec.append(out[j, : b.n[j]].astype(np.int16))
        outs.append(dec)
    return restore_order(buckets, outs)
