"""Codec protocol and registry.

Every method is a `bound / press / depress` triple, mirroring the
reference's naming and stream framings (reference: press/press.h).
`press` maps an int16 signal to bytes; `depress` needs the original
element count (the reference gets it from SLOW5 `len_raw_signal`, not
from the stream — see e.g. press/press.c:6574 contract comment).
"""

from __future__ import annotations

import numpy as np

_REGISTRY: dict = {}


class Codec:
    """Base class; subclasses implement press/depress on numpy arrays."""

    #: reference method name (press.h), e.g. "vbbe21_zd"
    name: str = ""

    def bound(self, nin: int) -> int:
        raise NotImplementedError

    def press(self, signal: np.ndarray) -> bytes:
        raise NotImplementedError

    def depress(self, stream: bytes, nin: int) -> np.ndarray:
        raise NotImplementedError

    # -- helpers -----------------------------------------------------------

    def roundtrip_ok(self, signal: np.ndarray) -> bool:
        sig = np.asarray(signal, dtype=np.int16)
        return np.array_equal(self.depress(self.press(sig), sig.size), sig)


def register(codec: Codec) -> Codec:
    if codec.name in _REGISTRY:
        raise ValueError(f"duplicate codec name {codec.name!r}")
    _REGISTRY[codec.name] = codec
    return codec


def get(name: str) -> Codec:
    _ensure_loaded()
    return _REGISTRY[name]


def names() -> list:
    _ensure_loaded()
    return sorted(_REGISTRY)


_LOADED = False


def _ensure_loaded():
    global _LOADED
    if _LOADED:
        return
    _LOADED = True
    # import for registration side effects
    from honours_tpu.codecs import (  # noqa: F401
        drans,
        dstall,
        dstall_drans,
        exzd,
        flac,
        flats,
        generic,
        huffman,
        pfor,
        raw,
        rc,
        rice,
        srans,
        srans2,
        srans3,
        stall,
        svb,
        uintc,
        vb,
    )
