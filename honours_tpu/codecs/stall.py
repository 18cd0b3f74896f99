"""Stall-segmentation codecs (rccm_svbbe21_zd / dstall_fz*).

Populated by the stall milestone (requires the rc codecs and the jnn
segmenter in honours_tpu.segment).
"""
