"""Bucketed engine runner + CLI --tpu path (CPU execution of the same
jitted engines the chip runs)."""

import numpy as np
import pytest

from honours_tpu.codecs import base as registry
from honours_tpu.engine import runner


@pytest.fixture(scope="module")
def mixed_reads(fixture_reads):
    rng = np.random.default_rng(21)
    return [
        fixture_reads[0][:3000],
        rng.integers(400, 700, 1500).astype(np.int16),
        np.array([256, 5, -3, 700, 0, 0, 0, 1], np.int16),
        np.zeros(5, np.int16),
        fixture_reads[1][2000:4500],
        np.tile(np.array([0, 30000], np.int16), 300),  # nex > emax row
        np.array([5], np.int16),
        rng.integers(-600, 600, 900).astype(np.int16),
        rng.integers(450, 520, 2048).astype(np.int16),
    ]


@pytest.mark.parametrize(
    "name", ["srans2_vbbe21_zd", "svb12_zd", "vbe21_zd", "vbsse21_zd", "svb_zd"]
)
def test_press_signals_tpu_byte_identical(mixed_reads, name):
    """Engine streams == host codec streams per read, original order,
    including the exception-cap overflow fallback row."""
    streams = runner.press_signals_tpu(mixed_reads, name, max_b=4)
    codec = registry.get(name)
    for i, s in enumerate(mixed_reads):
        assert streams[i] == codec.press(np.asarray(s, np.int16)), i


@pytest.mark.parametrize(
    "name", ["srans2_vbbe21_zd", "svb12_zd", "vbe21_zd", "vbsse21_zd", "svb_zd"]
)
def test_depress_signals_tpu_lossless(mixed_reads, name):
    codec = registry.get(name)
    streams = [codec.press(np.asarray(s, np.int16)) for s in mixed_reads]
    out = runner.depress_signals_tpu(
        streams, [s.size for s in mixed_reads], name, max_b=4
    )
    for i, s in enumerate(mixed_reads):
        assert np.array_equal(out[i], s), i


def test_shuff_press_engine_host_decodes(mixed_reads):
    """shuffman has a batched encoder; decode is host-side."""
    streams = runner.press_signals_tpu(mixed_reads, "shuffman_vbbe21_zd", max_b=4)
    codec = registry.get("shuffman_vbbe21_zd")
    for i, s in enumerate(mixed_reads):
        assert streams[i] == codec.press(np.asarray(s, np.int16)), i
    out = runner.depress_signals_tpu(
        streams, [s.size for s in mixed_reads], "shuffman_vbbe21_zd"
    )
    for i, s in enumerate(mixed_reads):
        assert np.array_equal(out[i], s), i


def test_non_engine_codec_falls_back_to_host(mixed_reads):
    streams = runner.press_signals_tpu(mixed_reads[:3], "vbbe21_zd")
    codec = registry.get("vbbe21_zd")
    for i, s in enumerate(mixed_reads[:3]):
        assert streams[i] == codec.press(np.asarray(s, np.int16)), i


def test_cli_press_depress_tpu_roundtrip(tmp_path):
    from honours_tpu.cli import main
    from honours_tpu.io import blow5

    src = "tests/data/three-reads.blow5"
    orig = blow5.read_signals(src)
    pressed = tmp_path / "p.blow5"
    restored = tmp_path / "r.blow5"
    assert main(["press", src, str(pressed), "--tpu",
                 "--codec", "srans2_vbbe21_zd"]) == 0
    # the engine-written file is byte-decodable by the plain host reader
    back = blow5.read_signals(str(pressed))
    assert all(np.array_equal(a, b) for a, b in zip(orig, back))
    assert main(["depress", str(pressed), str(restored), "--tpu"]) == 0
    final = blow5.read_signals(str(restored))
    assert all(np.array_equal(a, b) for a, b in zip(orig, final))


def test_harness_tpu_tsv(tmp_path, capsys):
    from honours_tpu.bench import harness

    rc = harness.main(
        ["tests/data/three-reads.blow5", "--tpu", "--methods", "svb12_zd"]
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("method\t")
    row = out[1].split("\t")
    assert row[0] == "svb12_zd" and float(row[3]) > 1.0
