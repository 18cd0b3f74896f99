import numpy as np

from honours_tpu.io import blow5


def test_read_fixture(fixture_reads):
    assert len(fixture_reads) == 3
    assert [r.size for r in fixture_reads] == [7329, 155185, 95350]
    assert all(r.dtype == np.int16 for r in fixture_reads)


def test_metadata():
    f5 = blow5.read_blow5("tests/data/three-reads.blow5")
    assert f5.version == (0, 2, 0)
    assert f5.num_read_groups == 1
    for r in f5.reads:
        assert r.digitisation == 2048.0
        assert r.sampling_rate == 4000.0


def test_write_read_roundtrip(tmp_path):
    f5 = blow5.read_blow5("tests/data/three-reads.blow5")
    out = tmp_path / "rt.blow5"
    blow5.write_blow5(str(out), f5)
    g5 = blow5.read_blow5(str(out))
    assert len(g5.reads) == len(f5.reads)
    for a, b in zip(f5.reads, g5.reads):
        assert a.read_id == b.read_id
        assert np.array_equal(a.signal, b.signal)
        assert a.aux == b.aux


def test_write_uncompressed_roundtrip(tmp_path):
    f5 = blow5.read_blow5("tests/data/three-reads.blow5")
    f5.record_press = blow5.RECORD_PRESS_NONE
    f5.signal_press = blow5.SIGNAL_PRESS_NONE
    out = tmp_path / "rt_raw.blow5"
    blow5.write_blow5(str(out), f5)
    g5 = blow5.read_blow5(str(out))
    for a, b in zip(f5.reads, g5.reads):
        assert np.array_equal(a.signal, b.signal)


def test_svb32_roundtrip():
    rng = np.random.default_rng(1)
    for n in [0, 1, 3, 4, 5, 1000]:
        v = rng.integers(0, 2**32, n, dtype=np.uint64).astype(np.uint32)
        enc = blow5.svb32_encode(v)
        dec, used = blow5.svb32_decode(enc, n)
        assert used == len(enc)
        assert np.array_equal(dec, v)
