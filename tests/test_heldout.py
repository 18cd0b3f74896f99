"""Held-out table protocol: tables from read 0 only, scored off-train.

VERDICT r2 item 2: the canned-table ratio must also be reported against
data the table never saw.  These tests pin the protocol's machinery:
deterministic regeneration, engine round trip with the held-out tables,
and the actual held-out ratio staying within a sane band of the
in-sample number on fixture read 1 material.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from honours_tpu.engine.entropy_o1 import make_o1_tables
from honours_tpu.engine.pipeline import (
    depress_srans2_batch,
    pad_batch,
    press_srans2_batch,
)
from honours_tpu.tables.o1 import build_o1_freqs, fixture_streams, heldout_o1_freqs


@pytest.fixture(scope="module")
def ho_tabs():
    return make_o1_tables(heldout_o1_freqs())


def test_heldout_table_is_deterministic_and_valid():
    t1 = heldout_o1_freqs()
    t2 = build_o1_freqs(fixture_streams()[:1])
    assert np.array_equal(t1, t2)
    assert t1.shape == (257, 256) and (t1 >= 1).all()
    assert (t1.sum(axis=1) == 4096).all()
    # trained on different data than the canned table
    from honours_tpu.tables.o1 import canned_o1_freqs

    assert not np.array_equal(t1, canned_o1_freqs())


def test_heldout_roundtrip_on_unseen_reads(fixture_reads, ho_tabs):
    """Engine encode/decode with read-0-trained tables is lossless on
    reads 1-2 slices (never seen at training time)."""
    sigs = [fixture_reads[1][:4096], fixture_reads[2][1000:5096]]
    sig, n = pad_batch(sigs)
    L = sig.shape[1]
    st, sl = press_srans2_batch(sig, n, ho_tabs)
    out = np.asarray(depress_srans2_batch(st, n, ho_tabs, L))
    for i, s in enumerate(sigs):
        assert np.array_equal(out[i, : s.size], s), i


def test_heldout_ratio_band(fixture_reads, ho_tabs):
    """Held-out compression on read 1 should stay within ~10% of the
    in-sample table's ratio (the table generalizes via shrinkage)."""
    from honours_tpu.engine.pipeline import canned_o1_device_tables

    sigs = [fixture_reads[1][:16384]]
    sig, n = pad_batch(sigs)
    _, sl_ho = press_srans2_batch(sig, n, ho_tabs)
    _, sl_in = press_srans2_batch(sig, n, canned_o1_device_tables())
    ho, ins = int(sl_ho[0]), int(sl_in[0])
    assert ho < 16384 * 2 * 0.45  # still compresses well off-train
    assert ho <= ins * 1.10
