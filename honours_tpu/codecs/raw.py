"""`none` method: raw memcpy (reference: press/press.c:187-196)."""

from __future__ import annotations

import numpy as np

from honours_tpu.codecs.base import Codec, register


class NoneCodec(Codec):
    name = "none"

    def bound(self, nin: int) -> int:
        return nin * 2

    def press(self, signal: np.ndarray) -> bytes:
        return np.ascontiguousarray(signal, dtype="<i2").tobytes()

    def depress(self, stream: bytes, nin: int) -> np.ndarray:
        return np.frombuffer(stream, dtype="<i2", count=nin).copy()


register(NoneCodec())
