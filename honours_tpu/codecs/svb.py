"""Stream-VByte codecs: svb, svb0124, svb12 (+ _zd variants).

Method mapping (reference: press/press.c:1514-1694):
  svb / svb0124        uint16 samples widened to u32, no transform
  svb12 (= svb16)      1-or-2-byte svb over uint16 samples
  *_zd                 zigzag-delta (prev=0, all nin values) fused in front
svb12 and svb12_nosimd share one wire format, as do their _zd variants
(press/svb16/encode_scalar.c vs press/streamvbyte/src/streamvbyte_12_encode.c).
"""

from __future__ import annotations

import numpy as np

from honours_tpu.codecs.base import Codec, register
from honours_tpu.kernels.svb import (
    svb0124_decode,
    svb0124_encode,
    svb16_decode,
    svb16_encode,
    svb16_max_encoded_length,
    svb32_decode,
    svb32_encode,
)
from honours_tpu.transforms.core import unzigdelta, zigdelta


class _SvbBase(Codec):
    zd = False

    def bound(self, nin: int) -> int:
        return 5 * nin + ((nin + 3) // 4) + 16

    def _fwd(self, signal: np.ndarray) -> np.ndarray:
        x = np.asarray(signal, dtype=np.int16)
        if self.zd:
            return zigdelta(x)
        return x.view(np.uint16)

    def _inv(self, values: np.ndarray) -> np.ndarray:
        if self.zd:
            return unzigdelta(values.astype(np.uint16))
        return values.astype(np.uint16).view(np.int16)


class Svb(_SvbBase):
    name = "svb"

    def press(self, signal):
        return svb32_encode(self._fwd(signal).astype(np.uint32))

    def depress(self, stream, nin):
        v, _ = svb32_decode(stream, nin)
        return self._inv(v)


class SvbZd(Svb):
    name = "svb_zd"
    zd = True


class Svb0124(_SvbBase):
    name = "svb0124"

    def press(self, signal):
        return svb0124_encode(self._fwd(signal).astype(np.uint32))

    def depress(self, stream, nin):
        v, _ = svb0124_decode(stream, nin)
        return self._inv(v)


class Svb0124Zd(Svb0124):
    name = "svb0124_zd"
    zd = True


class Svb12(_SvbBase):
    name = "svb12"

    def bound(self, nin: int) -> int:
        return svb16_max_encoded_length(nin)

    def press(self, signal):
        return svb16_encode(self._fwd(signal))

    def depress(self, stream, nin):
        v, _ = svb16_decode(stream, nin)
        return self._inv(v)


class Svb12Zd(Svb12):
    name = "svb12_zd"
    zd = True


class Svb12Nosimd(Svb12):
    """Same wire format as svb12 (the reference's scalar/SIMD pair share
    it, press/streamvbyte/src/streamvbyte_12_encode.c vs press/svb16/)."""

    name = "svb12_nosimd"


class Svb12ZdNosimd(Svb12Zd):
    name = "svb12_zd_nosimd"


register(Svb())
register(SvbZd())
register(Svb0124())
register(Svb0124Zd())
register(Svb12())
register(Svb12Zd())
register(Svb12Nosimd())
register(Svb12ZdNosimd())
