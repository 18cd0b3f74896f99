"""Central configuration.

The reference hardcodes every knob as a compile-time #define
(press/press.h:256-284 compression levels, press/press.c:7763/7913 stall
thresholds, press/test.h:97-98 FLAC params — SURVEY §5 flags this for
promotion).  Here they are one overridable dataclass; `Config.default()`
reproduces the reference's published settings.  Environment overrides use
the HTPU_ prefix (e.g. HTPU_ZSTD_LEVEL=3).
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass
class Config:
    # generic entropy layers (press/press.h:256-284)
    zlib_level: int = -1  # Z_DEFAULT_COMPRESSION
    zstd_level: int = 1
    bzip2_level: int = 9
    lzma2_preset: int = 6

    # stall segmentation (press/press.c:7763, 7913, 7772-7773;
    # jnn cDNA profile press/sigtk/src/jnn.h:40-49)
    stall_threshold: int = 140
    dstall_threshold: int = 1500
    stall_margin: int = 20

    # flats partitioner step granularity
    flats_step: int = 64

    # rANS geometry (kernels/rans.py)
    rans_lanes: int = 16

    # batched engine geometry
    bucket_min_l: int = 1 << 10
    batch_rows: int = 64

    @classmethod
    def default(cls) -> "Config":
        cfg = cls()
        for f in dataclasses.fields(cls):
            env = os.environ.get(f"HTPU_{f.name.upper()}")
            if env is not None:
                setattr(cfg, f.name, f.type(env) if callable(f.type) else int(env))
        return cfg


_CONFIG = None


def get_config() -> Config:
    global _CONFIG
    if _CONFIG is None:
        _CONFIG = Config.default()
    return _CONFIG
