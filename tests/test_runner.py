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


def test_drans_runner_roundtrip_and_interop(mixed_reads):
    """drans through the runner (VERDICT r4 item 2): bucket-grouped
    engine streams round-trip through the runner AND through the host
    grouped decoder (drans_depress_auto), including the overflow
    fallback row (G=1) mixed into an engine bucket."""
    from honours_tpu.codecs.drans import drans_depress_auto

    name = "drans_vbbe21_zd"
    assert runner.ENGINE_CODECS[name] == ("drans", "drans")
    lens = [s.size for s in mixed_reads]
    streams = runner.press_signals_tpu(mixed_reads, name, max_b=4)
    out = runner.depress_signals_tpu(streams, lens, name, max_b=4)
    for i, s in enumerate(mixed_reads):
        assert np.array_equal(out[i], s), i
    # host grouped decode of the same streams (same default bucketing)
    out2 = drans_depress_auto(streams, lens, max_b=4)
    for i, s in enumerate(mixed_reads):
        assert np.array_equal(out2[i], s), i
    # host-written per-read streams decode through the runner too
    codec = registry.get(name)
    host_streams = [codec.press(np.asarray(s, np.int16)) for s in mixed_reads]
    out3 = runner.depress_signals_tpu(host_streams, lens, name, max_b=4)
    for i, s in enumerate(mixed_reads):
        assert np.array_equal(out3[i], s), i


def test_drans_blow5_file_interop(tmp_path, mixed_reads):
    """A BLOW5 file written by press --tpu with drans decodes through
    the plain (host) read path via the grouped decoder."""
    from honours_tpu import cli
    from honours_tpu.io import blow5

    reads = [
        blow5.Blow5Read(
            read_id=f"r{i}", read_group=0, digitisation=2048.0, offset=0.0,
            range=1.0, sampling_rate=4000.0, signal=np.asarray(s, np.int16),
            aux=b"",
        )
        for i, s in enumerate(mixed_reads)
    ]
    f5 = blow5.Blow5File(
        version=(0, 2, 0), record_press=0, signal_press=0,
        num_read_groups=1, header=b"#\n", reads=reads,
    )
    src = str(tmp_path / "src.blow5")
    blow5.write_blow5(src, f5)
    dst = str(tmp_path / "drans.blow5")
    rc = cli.main(["press", src, dst, "--codec", "drans_vbbe21_zd", "--tpu"])
    assert rc in (0, None)
    back = blow5.read_blow5(dst)  # host path, grouped decode
    for i, s in enumerate(mixed_reads):
        assert np.array_equal(back.reads[i].signal, s), i
