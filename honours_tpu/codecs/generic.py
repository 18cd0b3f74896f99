"""Generic byte-level entropy back-ends and their compositions.

These wrap host LZ/entropy libraries (zlib, zstd, bzip2, LZMA2).  They are
deliberately host-side: in the reference they are vendored C comparison
baselines (press/press.c:1386-1510); the TPU-native entropy paths live in
the huffman / rc codecs.  zlib level = Z_DEFAULT_COMPRESSION, zstd level 1,
bzip2 blockSize 9 / workFactor 30 (press/press.h:256-284), matching the
reference byte-for-byte for zlib/bzip2/zstd.  The reference's fast-lzma2
(FL2) container is a bespoke stream format; we provide an LZMA2 layer via
liblzma raw streams instead (capability-equivalent, format-documented
deviation).

Composition framings:
- over uint/svb streams: [nin:u32 LE] prepended inside the compressed
  payload (press/press.c:767-772, 1713-1717)
- over vb*_zd / exzd streams: compressed directly, no prefix
  (press/press.c:3631-3646, 8461-8589)
"""

from __future__ import annotations

import bz2
import lzma
import struct
import zlib

import numpy as np

from honours_tpu.codecs.base import Codec, register

from honours_tpu.utils.config import get_config

try:
    import zstandard as _zstd

    _ZSTD_C = _zstd.ZstdCompressor(level=get_config().zstd_level)
    _ZSTD_D = _zstd.ZstdDecompressor()
except ImportError:  # pragma: no cover
    _zstd = None

_LZMA2_FILTERS = [{"id": lzma.FILTER_LZMA2, "preset": get_config().lzma2_preset}]


def zlib_press(data: bytes) -> bytes:
    return zlib.compress(data, get_config().zlib_level)


def zlib_depress(data: bytes) -> bytes:
    return zlib.decompress(data)


def zstd_press(data: bytes) -> bytes:
    return _ZSTD_C.compress(data)


def zstd_depress(data: bytes) -> bytes:
    return _ZSTD_D.decompress(data, max_output_size=max(16, len(data) * 200))


def bzip2_press(data: bytes) -> bytes:
    return bz2.compress(data, get_config().bzip2_level)


def bzip2_depress(data: bytes) -> bytes:
    return bz2.decompress(data)


def lzma2_press(data: bytes) -> bytes:
    return lzma.compress(data, format=lzma.FORMAT_RAW, filters=_LZMA2_FILTERS)


def lzma2_depress(data: bytes) -> bytes:
    return lzma.decompress(data, format=lzma.FORMAT_RAW, filters=_LZMA2_FILTERS)


LAYERS = {
    "zlib": (zlib_press, zlib_depress),
    "zstd": (zstd_press, zstd_depress),
    "bzip2": (bzip2_press, bzip2_depress),
    "fast_lzma2": (lzma2_press, lzma2_depress),
}


class ByteLayerCodec(Codec):
    """Generic layer applied to the raw little-endian int16 bytes."""

    def __init__(self, layer: str):
        self.name = layer
        self._press, self._depress = LAYERS[layer]

    def bound(self, nin: int) -> int:
        return nin * 2 + nin // 2 + 1024

    def press(self, signal):
        return self._press(np.ascontiguousarray(signal, dtype="<i2").tobytes())

    def depress(self, stream, nin):
        return np.frombuffer(self._depress(stream), dtype="<i2", count=nin).copy()


class OuterLayerCodec(Codec):
    """`<layer>_<inner>` composition.

    with_nin=True prepends [nin:u32] inside the compressed payload
    (uint/svb inner streams); False compresses the inner stream directly
    (vb/exzd inner streams).
    """

    def __init__(self, layer: str, inner: Codec, with_nin: bool, name=None):
        self.name = name or f"{layer}_{inner.name}"
        self.inner = inner
        self.with_nin = with_nin
        self._press, self._depress = LAYERS[layer]

    def bound(self, nin: int) -> int:
        return self.inner.bound(nin) + nin // 2 + 1024

    def press(self, signal):
        inner = self.inner.press(signal)
        if self.with_nin:
            n = np.asarray(signal).size
            inner = struct.pack("<I", n) + inner
        return self._press(inner)

    def depress(self, stream, nin):
        inner = self._depress(stream)
        if self.with_nin:
            (n,) = struct.unpack_from("<I", inner, 0)
            assert n == nin, f"embedded count {n} != expected {nin}"
            inner = inner[4:]
        return self.inner.depress(inner, nin)


def _register_compositions():
    # ensure the inner codec modules are registered first (import order under
    # base._ensure_loaded is alphabetical, so pull them in explicitly)
    from honours_tpu.codecs import raw, svb, uintc, vb  # noqa: F401
    from honours_tpu.codecs.base import _REGISTRY

    for layer in LAYERS:
        register(ByteLayerCodec(layer))

    def inner(name):
        return _REGISTRY[name]

    # uint compositions (press/press.h:133-183, 191-213)
    register(OuterLayerCodec("zlib", inner("uint_submin"), with_nin=True))
    register(OuterLayerCodec("zstd", inner("uint_submin"), with_nin=True))
    register(OuterLayerCodec("zlib", inner("uint_zd"), with_nin=True))
    register(OuterLayerCodec("zstd", inner("uint_zd"), with_nin=True))
    register(OuterLayerCodec("bzip2", inner("uint_zd"), with_nin=True))
    register(OuterLayerCodec("fast_lzma2", inner("uint_zd"), with_nin=True))

    # svb compositions (press/press.h:356-424)
    for layer in ("zlib", "zstd"):
        for base in ("svb_zd", "svb0124_zd", "svb12_zd"):
            register(OuterLayerCodec(layer, inner(base), with_nin=True))
    register(OuterLayerCodec("bzip2", inner("svb12_zd"), with_nin=True))
    register(OuterLayerCodec("fast_lzma2", inner("svb12_zd"), with_nin=True))

    # vb compositions (press/press.h:530-598)
    for base in ("vb1e2_zd", "vbe21_zd", "vbbe21_zd", "vbsbe21_zd", "vbsse21_zd"):
        register(OuterLayerCodec("zstd", inner(base), with_nin=False))
    for base in ("vbe21_zd", "vbbe21_zd", "vbsbe21_zd", "vbsse21_zd"):
        register(OuterLayerCodec("zlib", inner(base), with_nin=False))


_register_compositions()
