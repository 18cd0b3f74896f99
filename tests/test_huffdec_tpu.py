"""Chunked TPU Huffman decoder (engine/huffdec.py) — SURVEY §2.2 item 6.

Byte-equality against the native C LUT decoder (native/huffdec.c) and
the serial bit-walk on fixture shuffman streams and adversarial data.
"""

import struct

import numpy as np
import pytest

from honours_tpu.codecs.vb import PAYLOAD, exblock_len
from honours_tpu.engine.huffdec import huffman_decode_tpu
from honours_tpu.kernels.huffman_np import huffman_decode, huffman_encode
from honours_tpu.tables.huffman import na12878_table
from honours_tpu.transforms.core import zigdelta


@pytest.fixture(scope="module")
def table():
    return na12878_table()


def test_random_and_edges(table):
    rng = np.random.default_rng(3)
    datas = [
        rng.integers(0, 256, 5000).astype(np.uint8),
        rng.integers(0, 40, 3000).astype(np.uint8),
        np.zeros(100, np.uint8),
        rng.integers(0, 256, 1).astype(np.uint8),
        np.full(2000, 255, np.uint8),  # longest codes
    ]
    streams = [huffman_encode(d, table) for d in datas]
    outs = huffman_decode_tpu(streams, [d.size for d in datas], table)
    for i, (d, o) in enumerate(zip(datas, outs)):
        assert np.array_equal(d, o), i
        assert np.array_equal(huffman_decode(streams[i], d.size, table), o), i


def test_fixture_shuffman_bodies(table, fixture_reads):
    """The actual shuffman_vbbe21_zd payload bodies of the fixture reads
    decode byte-equal with the host path."""
    datas, streams = [], []
    for s in fixture_reads:
        zd = zigdelta(np.asarray(s, np.int16))
        vb = PAYLOAD["vbbe21"][0](zd[1:])
        exlen = exblock_len(vb, 0, "vbbe21")
        data = np.frombuffer(vb, np.uint8, offset=exlen)
        datas.append(data)
        streams.append(huffman_encode(data, table))
    outs = huffman_decode_tpu(streams, [d.size for d in datas], table)
    for i, (d, o) in enumerate(zip(datas, outs)):
        assert np.array_equal(d, o), i


def test_shuffman_codec_stream_parity(table, read0):
    """Decode the shuffman codec's own body region (golden-formatted
    stream) through the TPU decoder."""
    from honours_tpu.codecs.base import get

    c = get("shuffman_vbbe21_zd")
    blob = c.press(read0)
    exlen = exblock_len(blob, 2, "vbbe21")
    (nex,) = struct.unpack_from("<I", blob, 2)
    ndata = read0.size - 1 - nex
    body = blob[2 + exlen :]
    (datalen,) = struct.unpack_from(">I", body, 0)
    assert datalen == ndata
    bits = body[4:]
    (out,) = huffman_decode_tpu([bits], [ndata], table)
    assert np.array_equal(huffman_decode(bits, ndata, table), out)
