"""Batched TPU engines: jit-compiled fixed-shape encode/decode pipelines.

Every engine operates on a padded batch of reads ``[B, L] int16`` with a
lengths vector ``[B]`` and returns padded byte buffers plus per-read
lengths; streams are bit-identical to the serial host codecs so either
side can decode the other.
"""
