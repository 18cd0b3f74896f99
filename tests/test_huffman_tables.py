import numpy as np

from honours_tpu.tables.huffman import (
    NA12878_ZD_FREQ,
    build_table,
    na12878_table,
    parse_file,
    serialize_file,
)


def test_regenerate_canned_table_from_frequencies():
    """Our deterministic tree build reproduces the committed canned table
    (i.e. gen_huffman.c's output) exactly."""
    built = build_table(NA12878_ZD_FREQ)
    canned = na12878_table()
    assert np.array_equal(built.lengths, canned.lengths)
    assert np.array_equal(built.codes, canned.codes)
    assert np.array_equal(built.present_mask, canned.present_mask)


def test_table_file_serialization_roundtrip():
    canned = na12878_table()
    blob = serialize_file(canned, 12345)
    table, data_bytes = parse_file(blob)
    assert data_bytes == 12345
    assert np.array_equal(table.lengths, canned.lengths)
    assert np.array_equal(table.codes, canned.codes)


def test_canned_table_matches_reference_file_bytes():
    """Re-serializing the parsed table reproduces the reference file
    byte-for-byte (entry order = symbol order)."""
    from pathlib import Path

    import honours_tpu.tables as t

    raw = (Path(t.__file__).parent / "NA12878_zd.huffman").read_bytes()
    table, data_bytes = parse_file(raw)
    assert serialize_file(table, data_bytes) == raw
