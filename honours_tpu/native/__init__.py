"""Native entropy runtime: ctypes bindings for the C range coder.

The shared library is rebuilt on demand from rangecoder.c whenever the
source is newer than the binary (no pip deps; plain cc).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).parent
_SRCS = [_DIR / "rangecoder.c", _DIR / "segment.c", _DIR / "blow5io.c", _DIR / "huffdec.c"]
_SO = _DIR / "librangecoder.so"

_lib = None


def _build():
    import shutil

    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        raise RuntimeError(
            "honours_tpu.native needs a C compiler (cc/gcc/clang) to build "
            f"{_SO.name}; install one or ship a prebuilt librangecoder.so "
            "next to the sources"
        )
    subprocess.run(
        [cc, "-O3", "-Wall", "-shared", "-fPIC"]
        + [str(p) for p in _SRCS]
        + ["-o", str(_SO), "-lm", "-lz"],
        check=True,
        cwd=str(_DIR),
    )


def get_lib():
    global _lib
    if _lib is None:
        stale = _SO.exists() and any(
            _SO.stat().st_mtime < p.stat().st_mtime for p in _SRCS
        )
        if not _SO.exists():
            _build()
        elif stale:
            try:
                _build()
            except RuntimeError:
                import warnings

                warnings.warn(
                    "no C compiler found; using the stale prebuilt "
                    f"{_SO.name} (sources are newer)"
                )
        _lib = ctypes.CDLL(str(_SO))
        for fn in (
            "ht_rc0_encode",
            "ht_rc0_decode",
            "ht_rc1_encode",
            "ht_rc1_decode",
            "ht_rccm_encode",
            "ht_rccm_decode",
        ):
            f = getattr(_lib, fn)
            f.restype = ctypes.c_size_t
            f.argtypes = [ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p] + (
                [ctypes.c_size_t] if fn.endswith("decode") else []
            )
        _lib.ht_huffman_decode.restype = ctypes.c_size_t
        _lib.ht_huffman_decode.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_size_t,
        ]
        _lib.ht_blow5_scan.restype = ctypes.c_int64
        _lib.ht_blow5_scan.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        _lib.ht_zlib_inflate.restype = ctypes.c_int64
        _lib.ht_zlib_inflate.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
        ]
        _lib.ht_find_stall.restype = ctypes.c_int
        _lib.ht_find_stall.argtypes = [
            ctypes.c_void_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16),
            ctypes.POINTER(ctypes.c_uint16),
        ]
    return _lib


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def _encode(fn: str, data) -> bytes:
    d = np.ascontiguousarray(data, dtype=np.uint8)
    out = np.zeros(d.size + d.size // 2 + 1024, dtype=np.uint8)
    n = getattr(get_lib(), fn)(_ptr(d), d.size, _ptr(out))
    return out[:n].tobytes()


def _decode(fn: str, stream: bytes, n: int) -> np.ndarray:
    s = np.frombuffer(stream, dtype=np.uint8)
    out = np.zeros(n, dtype=np.uint8)
    getattr(get_lib(), fn)(_ptr(s), s.size, _ptr(out), n)
    return out


def rc0_encode(data) -> bytes:
    return _encode("ht_rc0_encode", data)


def rc0_decode(stream: bytes, n: int) -> np.ndarray:
    return _decode("ht_rc0_decode", stream, n)


def rc1_encode(data) -> bytes:
    return _encode("ht_rc1_encode", data)


def rc1_decode(stream: bytes, n: int) -> np.ndarray:
    return _decode("ht_rc1_decode", stream, n)


def rccm_encode(data) -> bytes:
    return _encode("ht_rccm_encode", data)


def rccm_decode(stream: bytes, n: int) -> np.ndarray:
    return _decode("ht_rccm_decode", stream, n)


def find_stall(signal) -> tuple:
    """(exists, start, length) of the first stall segment
    (reference: press/press.c:7728-7746 find_stall over jnn_raw)."""
    sig = np.ascontiguousarray(signal, dtype=np.int16)
    start = ctypes.c_uint16(0)
    length = ctypes.c_uint16(0)
    r = get_lib().ht_find_stall(
        _ptr(sig), sig.size, ctypes.byref(start), ctypes.byref(length)
    )
    return bool(r), start.value, length.value


def blow5_scan(data: np.ndarray, start: int, max_records: int):
    """Native record scan: returns (offsets, sizes) arrays."""
    offsets = np.zeros(max_records, np.uint64)
    sizes = np.zeros(max_records, np.uint64)
    n = get_lib().ht_blow5_scan(
        _ptr(data), data.size, start, _ptr(offsets), _ptr(sizes), max_records
    )
    if n < 0:
        raise ValueError("truncated blow5 record stream")
    return offsets[:n], sizes[:n]


def zlib_inflate(data: np.ndarray, out_cap: int) -> np.ndarray:
    out = np.zeros(out_cap, np.uint8)
    n = get_lib().ht_zlib_inflate(_ptr(data), data.size, _ptr(out), out_cap)
    if n < 0:
        raise ValueError("zlib inflate failed")
    return out[:n]


def huffman_decode_lut(stream: bytes, n: int, sym_lut: np.ndarray,
                       len_lut: np.ndarray, width: int) -> np.ndarray:
    s = np.frombuffer(stream, dtype=np.uint8)
    out = np.zeros(n, np.uint8)
    got = get_lib().ht_huffman_decode(
        _ptr(s), s.size, _ptr(sym_lut), _ptr(len_lut), width, _ptr(out), n
    )
    if got != n:
        raise ValueError(f"huffman stream corrupt: decoded {got} of {n}")
    return out
