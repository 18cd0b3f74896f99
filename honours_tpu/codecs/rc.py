"""Range/rANS entropy codecs (rc / rcc / rccm / rccdf families).

Implemented in honours_tpu.kernels.rans / rangecoder; populated by the
rc milestone.
"""
