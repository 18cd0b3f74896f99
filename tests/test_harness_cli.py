"""Benchmark harness TSV schema + CLI press/depress round trip."""

import io
import sys

import numpy as np

from honours_tpu.bench import harness
from honours_tpu.cli import main as cli_main
from honours_tpu.codecs import base as registry
from honours_tpu.io import blow5


def test_harness_tsv_schema(capsys):
    harness.main(["tests/data/three-reads.blow5", "--methods", "none,uint_zd"])
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "method",
        "pressbound_bytes",
        "press_bytes",
        "press_ratio",
        "depress_bytes",
        "pressbound_time",
        "press_time",
        "depress_time",
    ]
    rows = [line.split("\t") for line in out[1:]]
    assert [r[0] for r in rows] == ["none", "uint_zd"]
    assert float(rows[0][3]) == 1.0  # none ratio
    assert float(rows[1][3]) > 1.5  # uint_zd compresses


def test_harness_per_read(capsys):
    harness.main(
        ["tests/data/three-reads.blow5", "--methods", "svb12_zd", "--per-read"]
    )
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].startswith("read\tmethod")
    assert len(out) == 4  # header + 3 reads


def test_cli_press_depress(tmp_path):
    comp = tmp_path / "c.blow5"
    rest = tmp_path / "r.blow5"
    cli_main(
        [
            "press",
            "tests/data/three-reads.blow5",
            str(comp),
            "--codec",
            "shuffman_vbbe21_zd",
        ]
    )
    cli_main(["depress", str(comp), str(rest)])
    a = blow5.read_blow5("tests/data/three-reads.blow5")
    b = blow5.read_blow5(str(rest))
    for x, y in zip(a.reads, b.reads):
        assert np.array_equal(x.signal, y.signal)
        assert x.read_id == y.read_id


def test_default_method_list_all_registered():
    missing = [m for m in harness.DEFAULT_METHODS if m not in registry.names()]
    assert not missing, missing
