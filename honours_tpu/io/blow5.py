"""SLOW5/BLOW5 file reading and writing.

A from-scratch, dependency-free reader/writer for the BLOW5 binary format
(and the ASCII SLOW5 variant) sufficient for the signal-compression
framework: it recovers per-read int16 raw-signal arrays plus the primary
record metadata.

Format knowledge (studied from the reference toolchain's vendored
slow5lib: sigtk/slow5lib/src/slow5.c - header parse at slow5.c:789-880,
binary record parse at slow5.c:2840-2915, signal codec framing at
slow5_press.c:1054-1110):

  fixed header:
    [magic  "BLOW5\\x01" : 6B]
    [version major/minor/patch : 3 x u8]
    [record compression : u8]    0=none 1=zlib 2=zstd
    [num read groups : u32 LE]
    [signal compression : u8]    0=none 1=svb-zd  (present for version >= 0.2.0)
    ... zero padding to byte offset 64 ...
    [ascii header size : u32 LE]
    [ascii header : tab-separated @key\\tvalue lines + #char_type / #column
     lines, exactly `ascii header size` bytes]

  each record:
    [record size : u64 LE][record payload, record-compressed]
  decompressed record payload (primary columns in order, slow5_defs.h:84-92):
    [read_id_len : u16][read_id bytes]
    [read_group : u32]
    [digitisation, offset, range, sampling_rate : 4 x f64]
    [len_raw_signal : u64]   (= number of int16 samples if signal
                              uncompressed, else compressed byte count)
    [raw signal bytes]
    [auxiliary column data ...]

  signal svb-zd codec (slow5_press.c:1054-1082): samples widened to int32,
  zigzag-delta with prev=0, then classical 32-bit streamvbyte with a
  leading [count u32 LE], i.e. [count][keys ceil(count/4)B][data].
"""

from __future__ import annotations

import io as _pyio
import struct
import zlib
from dataclasses import dataclass, field

import numpy as np

MAGIC = b"BLOW5\x01"
HDR_SIZE_OFFSET = 64

RECORD_PRESS_NONE = 0
RECORD_PRESS_ZLIB = 1
RECORD_PRESS_ZSTD = 2

SIGNAL_PRESS_NONE = 0
SIGNAL_PRESS_SVB_ZD = 1
#: extension: any registered honours_tpu codec, named in the ascii header
#: via an "@htpu_signal_codec\t<name>" line; signal blob = [nin:u32][stream]
SIGNAL_PRESS_HTPU = 0xF0


@dataclass
class Blow5Read:
    """One SLOW5 record's primary fields."""

    read_id: str
    read_group: int
    digitisation: float
    offset: float
    range: float
    sampling_rate: float
    signal: np.ndarray  # int16 (None when read with decode_signal=False)
    aux: bytes = b""  # raw trailing auxiliary bytes (opaque, preserved)
    signal_stream: bytes = None  # raw codec stream (decode_signal=False)
    signal_len: int = 0  # sample count for signal_stream


@dataclass
class Blow5File:
    version: tuple = (0, 2, 0)
    record_press: int = RECORD_PRESS_ZLIB
    signal_press: int = SIGNAL_PRESS_SVB_ZD
    num_read_groups: int = 1
    header: bytes = b""
    reads: list = field(default_factory=list)


from honours_tpu.kernels.svb import svb32_decode, svb32_encode  # noqa: F401


def _zigzag_encode32(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.int32)
    return (((x << 1) ^ (x >> 31)).astype(np.uint32))


def _zigzag_decode32(z: np.ndarray) -> np.ndarray:
    z = z.astype(np.uint32)
    return ((z >> 1) ^ (-(z & 1)).astype(np.uint32)).astype(np.int32)


def signal_svb_zd_encode(signal: np.ndarray) -> bytes:
    """slow5 svb-zd signal codec: [count u32][svb32 of int32 zigzag-delta]."""
    x = np.ascontiguousarray(signal, dtype=np.int16).astype(np.int32)
    prev = np.concatenate([[np.int32(0)], x[:-1]])
    diff = _zigzag_encode32(x - prev)
    return struct.pack("<I", x.size) + svb32_encode(diff)


def signal_svb_zd_decode(buf: bytes) -> np.ndarray:
    (count,) = struct.unpack_from("<I", buf, 0)
    diff, _used = svb32_decode(buf[4:], count)
    deltas = _zigzag_decode32(diff)
    return np.cumsum(deltas, dtype=np.int32).astype(np.int16)


def _decompress_record(payload: bytes, method: int) -> bytes:
    if method == RECORD_PRESS_NONE:
        return payload
    if method == RECORD_PRESS_ZLIB:
        return zlib.decompress(payload)
    if method == RECORD_PRESS_ZSTD:
        import zstandard

        return zstandard.ZstdDecompressor().decompress(payload)
    raise ValueError(f"unknown record compression method {method}")


def _compress_record(payload: bytes, method: int) -> bytes:
    if method == RECORD_PRESS_NONE:
        return payload
    if method == RECORD_PRESS_ZLIB:
        return zlib.compress(payload, 6)
    if method == RECORD_PRESS_ZSTD:
        import zstandard

        return zstandard.ZstdCompressor(level=1).compress(payload)
    raise ValueError(f"unknown record compression method {method}")


def parse_record(payload: bytes, signal_press: int, signal_codec=None,
                 decode_signal: bool = True) -> Blow5Read:
    off = 0
    (rid_len,) = struct.unpack_from("<H", payload, off)
    off += 2
    read_id = payload[off : off + rid_len].decode()
    off += rid_len
    read_group, digitisation, offset_, range_, sampling_rate, len_raw = (
        struct.unpack_from("<IddddQ", payload, off)
    )
    off += 4 + 8 * 4 + 8
    signal = None
    signal_stream = None
    signal_len = 0
    if signal_press == SIGNAL_PRESS_NONE:
        nbytes = int(len_raw) * 2
        signal = np.frombuffer(payload[off : off + nbytes], dtype="<i2").copy()
    elif signal_press == SIGNAL_PRESS_SVB_ZD:
        nbytes = int(len_raw)
        signal = signal_svb_zd_decode(payload[off : off + nbytes])
    elif signal_press == SIGNAL_PRESS_HTPU:
        nbytes = int(len_raw)
        blob = payload[off : off + nbytes]
        (nin,) = struct.unpack_from("<I", blob, 0)
        if decode_signal:
            signal = np.asarray(
                signal_codec.depress(blob[4:], nin), dtype=np.int16
            )
        else:
            signal_stream = blob[4:]
            signal_len = int(nin)
    else:
        raise ValueError(f"unhandled signal compression {signal_press}")
    off += nbytes
    return Blow5Read(
        read_id=read_id,
        read_group=read_group,
        digitisation=digitisation,
        offset=offset_,
        range=range_,
        sampling_rate=sampling_rate,
        signal=signal,
        aux=payload[off:],
        signal_stream=signal_stream,
        signal_len=signal_len,
    )


def build_record(read: Blow5Read, signal_press: int, signal_codec=None,
                 pressed: bytes = None) -> bytes:
    rid = read.read_id.encode()
    head = struct.pack("<H", len(rid)) + rid
    meta = struct.pack(
        "<Idddd",
        read.read_group,
        read.digitisation,
        read.offset,
        read.range,
        read.sampling_rate,
    )
    if signal_press == SIGNAL_PRESS_NONE:
        sig = np.ascontiguousarray(read.signal, dtype="<i2").tobytes()
        length = read.signal.size
    elif signal_press == SIGNAL_PRESS_SVB_ZD:
        sig = signal_svb_zd_encode(read.signal)
        length = len(sig)
    elif signal_press == SIGNAL_PRESS_HTPU:
        x = np.ascontiguousarray(read.signal, dtype=np.int16)
        blob = pressed if pressed is not None else signal_codec.press(x)
        sig = struct.pack("<I", x.size) + blob
        length = len(sig)
    else:
        raise ValueError(f"unhandled signal compression {signal_press}")
    return head + meta + struct.pack("<Q", length) + sig + read.aux


def read_blow5(path: str, decode_signal: bool = True) -> Blow5File:
    """Parse a BLOW5 file.  decode_signal=False leaves HTPU-compressed
    signals as raw streams (read.signal_stream / read.signal_len) so a
    batched engine can decode them (engine/runner.py)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:6] != MAGIC:
        raise ValueError("not a BLOW5 file (bad magic)")
    major, minor, patch = data[6], data[7], data[8]
    record_press = data[9]
    (num_rg,) = struct.unpack_from("<I", data, 10)
    signal_press = data[14] if (major, minor) >= (0, 2) else SIGNAL_PRESS_NONE
    (hdr_size,) = struct.unpack_from("<I", data, HDR_SIZE_OFFSET)
    off = HDR_SIZE_OFFSET + 4
    header = data[off : off + hdr_size]
    off += hdr_size

    out = Blow5File(
        version=(major, minor, patch),
        record_press=record_press,
        signal_press=signal_press,
        num_read_groups=num_rg,
        header=header,
    )
    signal_codec = None
    if signal_press == SIGNAL_PRESS_HTPU:
        name = htpu_codec_name(header)
        if name is None:
            raise ValueError("htpu signal compression but no @htpu_signal_codec")
        from honours_tpu.codecs import base as _registry

        signal_codec = _registry.get(name)
    # group-unit codecs (drans: the batch is the compression unit) must
    # decode whole-file so the group fit can be re-derived — parse the
    # raw streams first, then decode them together in original order
    group_decode = decode_signal and getattr(signal_codec, "grouped", False)
    n = len(data)
    while off + 8 <= n:
        (rec_size,) = struct.unpack_from("<Q", data, off)
        off += 8
        payload = _decompress_record(data[off : off + rec_size], record_press)
        off += rec_size
        out.reads.append(
            parse_record(
                payload, signal_press, signal_codec,
                decode_signal and not group_decode,
            )
        )
    if group_decode and out.reads:
        sigs = signal_codec.depress_group(
            [r.signal_stream for r in out.reads],
            [r.signal_len for r in out.reads],
        )
        for r, s in zip(out.reads, sigs):
            r.signal = np.asarray(s, dtype=np.int16)
            r.signal_stream = None
    return out


def htpu_codec_name(header: bytes):
    for line in header.split(b"\n"):
        if line.startswith(b"@htpu_signal_codec\t"):
            return line.split(b"\t", 1)[1].decode().strip()
    return None


def write_blow5(path: str, f5: Blow5File, signal_codec: str = None,
                signal_streams: list = None) -> None:
    """Write a BLOW5 file; signal_codec selects any registered codec for the
    signal field (stored as the @htpu_signal_codec header line).

    signal_streams: optional precomputed per-read compressed blobs (e.g.
    from engine.runner.press_signals_tpu) — must match the codec's wire
    format; build_record embeds them instead of calling codec.press.
    """
    codec = None
    if signal_codec is not None:
        from honours_tpu.codecs import base as _registry

        codec = _registry.get(signal_codec)
        f5.signal_press = SIGNAL_PRESS_HTPU
        if htpu_codec_name(f5.header) != signal_codec:
            lines = [
                ln
                for ln in f5.header.split(b"\n")
                if not ln.startswith(b"@htpu_signal_codec\t")
            ]
            tag = b"@htpu_signal_codec\t" + signal_codec.encode()
            lines.insert(1 if lines else 0, tag)
            f5.header = b"\n".join(lines)
    buf = _pyio.BytesIO()
    buf.write(MAGIC)
    buf.write(bytes(f5.version))
    buf.write(bytes([f5.record_press]))
    buf.write(struct.pack("<I", f5.num_read_groups))
    buf.write(bytes([f5.signal_press]))
    buf.write(b"\x00" * (HDR_SIZE_OFFSET - buf.tell()))
    buf.write(struct.pack("<I", len(f5.header)))
    buf.write(f5.header)
    for i, read in enumerate(f5.reads):
        pressed = signal_streams[i] if signal_streams is not None else None
        payload = _compress_record(
            build_record(read, f5.signal_press, codec, pressed),
            f5.record_press,
        )
        buf.write(struct.pack("<Q", len(payload)))
        buf.write(payload)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def read_signals(path: str) -> list:
    """Convenience: list of int16 numpy arrays, one per read."""
    return [r.signal for r in read_blow5(path).reads]
