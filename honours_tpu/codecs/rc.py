"""Range-coder codec family: rc (order-0), rcc (order-1), rccm (context
mixing), rccdf (static-CDF rANS).

Entropy back-ends: the native adaptive binary range coder
(honours_tpu/native/rangecoder.c — our from-scratch replacement for the
reference's Turbo-Range-Coder rcsenc/rccsenc/rcmsenc) and the TPU-friendly
interleaved static-CDF rANS (honours_tpu/kernels/rans.py, replacing
rccdfenc).  Wire formats around them mirror the reference compositions:

  rc*_<vb>_zd   [zd0:u16][ex block raw][coder(1B data)]   data count =
                nin-1-nex  (press/press.c:5427-5462 pattern)
  rc*_<vb>      [ex block raw][coder(1B data)]            count = nin-nex
                (press/press.c:5598-5886)
  rccm_vbbe21_submin  [min:u16][ex block][rccm(data)]
                (press/press.c:8037-8096)
  rc_zd         [rc0(zigzag-delta stream as u16 LE bytes)]
  rccm_svb_zd / rccm_svb12_zd  [svb_len:u32][rccm(whole svb stream)]

Deviations from the reference (documented):
- rc_zd drops the reference's zd[0]/2 trick and decodes every sample; the
  reference only round-trips the first half of each read
  (press/press.c:5398-5415 + test.c:4400 half-verify).
- rccm_svb_zd/rccm_svb12_zd carry an explicit svb byte length so decode is
  complete (same reference half-bug, press/press.c:7245-7260).
"""

from __future__ import annotations

import struct

import numpy as np

from honours_tpu import native
from honours_tpu.codecs.base import Codec, register
from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.kernels.rans import rans_bound, rans_decode, rans_encode
from honours_tpu.transforms.core import unzigdelta, zigdelta

CODERS = {
    "rc": (native.rc0_encode, native.rc0_decode),
    "rcc": (native.rc1_encode, native.rc1_decode),
    "rccm": (native.rccm_encode, native.rccm_decode),
    "rccdf": (rans_encode, rans_decode),
}


def _exkind(kind: str) -> str:
    return "vbe21" if kind == "vbe21" else kind


class RcVbZdCodec(Codec):
    """<coder>_<vb>_zd"""

    def __init__(self, coder: str, kind: str):
        self.name = f"{coder}_{kind}_zd"
        self.kind = kind
        self._enc, self._dec = CODERS[coder]
        self._vb_press, self._vb_depress = PAYLOAD[kind]

    def bound(self, nin: int) -> int:
        return 2 + rans_bound(2 * nin)

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        vb = self._vb_press(zd[1:])
        exlen = exblock_len(vb, 0, _exkind(self.kind))
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        return zd[:1].astype("<u2").tobytes() + vb[:exlen] + self._enc(data)

    def depress(self, stream, nin):
        exlen = exblock_len(stream, 2, _exkind(self.kind))
        (nex,) = struct.unpack_from("<I", stream, 2)
        data = self._dec(stream[2 + exlen :], nin - 1 - nex)
        vb = stream[2 : 2 + exlen] + data.tobytes()
        zd = np.empty(nin, dtype=np.uint16)
        zd[0] = np.frombuffer(stream, dtype="<u2", count=1)[0]
        zd[1:] = self._vb_depress(vb, nin - 1)
        return unzigdelta(zd)


class RcVbCodec(Codec):
    """<coder>_<vb> on raw uint16 samples (no transform)."""

    def __init__(self, coder: str, kind: str):
        self.name = f"{coder}_{kind}"
        self.kind = kind
        self._enc, self._dec = CODERS[coder]
        self._vb_press, self._vb_depress = PAYLOAD[kind]

    def bound(self, nin: int) -> int:
        return rans_bound(2 * nin)

    def press(self, signal):
        v = np.asarray(signal, dtype=np.int16).view(np.uint16)
        vb = self._vb_press(v)
        exlen = exblock_len(vb, 0, _exkind(self.kind))
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        return vb[:exlen] + self._enc(data)

    def depress(self, stream, nin):
        exlen = exblock_len(stream, 0, _exkind(self.kind))
        (nex,) = struct.unpack_from("<I", stream, 0)
        data = self._dec(stream[exlen:], nin - nex)
        vb = stream[:exlen] + data.tobytes()
        return self._vb_depress(vb, nin).view(np.int16).copy()


class RcZdCodec(Codec):
    name = "rc_zd"

    def bound(self, nin: int) -> int:
        return rans_bound(2 * nin)

    def press(self, signal):
        zd = zigdelta(np.asarray(signal, dtype=np.int16))
        return native.rc0_encode(np.frombuffer(zd.astype("<u2").tobytes(), np.uint8))

    def depress(self, stream, nin):
        raw = native.rc0_decode(stream, 2 * nin)
        zd = np.frombuffer(raw.tobytes(), dtype="<u2")
        return unzigdelta(zd)


class RccmSvbZdCodec(Codec):
    """rccm over a whole svb(_zd) stream, length-prefixed."""

    def __init__(self, name: str, inner_name: str):
        self.name = name
        self._inner_name = inner_name

    def bound(self, nin: int) -> int:
        return 4 + rans_bound(5 * nin)

    @property
    def inner(self):
        from honours_tpu.codecs.base import get

        return get(self._inner_name)

    def press(self, signal):
        svb = self.inner.press(signal)
        return struct.pack("<I", len(svb)) + native.rccm_encode(
            np.frombuffer(svb, np.uint8)
        )

    def depress(self, stream, nin):
        (svb_len,) = struct.unpack_from("<I", stream, 0)
        svb = native.rccm_decode(stream[4:], svb_len).tobytes()
        return self.inner.depress(svb, nin)


class RccmVbbe21SubminCodec(Codec):
    name = "rccm_vbbe21_submin"

    def bound(self, nin: int) -> int:
        return 2 + rans_bound(2 * nin)

    def press(self, signal):
        u = np.asarray(signal, dtype=np.int16).view(np.uint16)
        mn = int(u.min()) if u.size else 0
        v = (u - np.uint16(mn)).astype(np.uint16)
        vb = PAYLOAD["vbbe21"][0](v)
        exlen = exblock_len(vb, 0, "vbbe21")
        data = np.frombuffer(vb, dtype=np.uint8, offset=exlen)
        return struct.pack("<H", mn) + vb[:exlen] + native.rccm_encode(data)

    def depress(self, stream, nin):
        (mn,) = struct.unpack_from("<H", stream, 0)
        exlen = exblock_len(stream, 2, "vbbe21")
        (nex,) = struct.unpack_from("<I", stream, 2)
        data = native.rccm_decode(stream[2 + exlen :], nin - nex)
        vb = stream[2 : 2 + exlen] + data.tobytes()
        v = PAYLOAD["vbbe21"][1](vb, nin)
        return (v + np.uint16(mn)).view(np.int16).copy()


for _coder in ("rc", "rcc", "rccm", "rccdf"):
    for _kind in ("vbe21", "vbbe21", "vbsbe21", "vbsse21"):
        register(RcVbZdCodec(_coder, _kind))
for _kind in ("vbbe21", "vbsbe21", "vbsse21"):
    register(RcVbCodec("rc", _kind))
    register(RcVbCodec("rccm", _kind))
register(RcZdCodec())
register(RccmSvbZdCodec("rccm_svb_zd", "svb_zd"))
register(RccmSvbZdCodec("rccm_svb12_zd", "svb12_zd"))
register(RccmVbbe21SubminCodec())
