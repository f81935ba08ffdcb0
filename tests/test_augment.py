"""Image augmentation (engine/image/augment.py): transform algebra,
checksum exactness, and the Spark mapInPandas plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.image.augment import OPS, apply_op, augment_images
from engine.image.codec import decode, encode_rgb8
from engine.image.phash import phash64
from engine.synth import gen_images


def _pix(seed=3, h=24, w=40):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), np.uint8)


# ------------------------------------------------------------- kernel algebra

def test_flip_involutions_and_rot90_order4():
    pix = _pix()
    assert np.array_equal(apply_op(apply_op(pix, "hflip"), "hflip"), pix)
    assert np.array_equal(apply_op(apply_op(pix, "vflip"), "vflip"), pix)
    r = pix
    for _ in range(4):
        r = apply_op(r, "rot90")
    assert np.array_equal(r, pix)
    # rot90 swaps dims; flips preserve them
    assert apply_op(pix, "rot90").shape == (40, 24, 3)
    assert apply_op(pix, "hflip").shape == pix.shape


def test_permutation_ops_preserve_pixel_sum_crop_halves_dims():
    pix = _pix()
    s = int(pix.astype(np.uint64).sum())
    for op in ("hflip", "vflip", "rot90"):
        assert int(apply_op(pix, op).astype(np.uint64).sum()) == s
    c = apply_op(pix, "crop_center")
    assert c.shape == (12, 20, 3)
    # crop is a view of the original: every cropped pixel exists at the
    # expected offset
    assert np.array_equal(c, pix[6:18, 10:30])


def test_hflip_equals_column_reversal_reference():
    pix = _pix(seed=9, h=5, w=7)
    ref = np.stack([pix[:, ::-1, c] for c in range(3)], axis=2)
    assert np.array_equal(apply_op(pix, "hflip"), ref)


def test_unknown_op_raises():
    with pytest.raises(ValueError):
        apply_op(_pix(), "zoom")


# ----------------------------------------------------------- spark plumbing

def test_augment_images_matches_local_kernel(spark):
    imgs = gen_images(spark, 24, seed=11)
    out = {(r.image_id, r.op): r
           for r in augment_images(imgs).collect()}
    assert len(out) == 24 * len(OPS)
    for row in imgs.collect():
        pix = decode(row.bytes, row.w, row.h, row.fmt)
        for op in OPS:
            aug = apply_op(pix, op)
            got = out[(row.image_id, op)]
            assert (got.h, got.w) == aug.shape[:2]
            assert got.pix_sum == int(aug.astype(np.uint64).sum())
            assert got.phash == phash64(np.ascontiguousarray(aug))


def test_augment_with_bytes_roundtrips(spark):
    imgs = gen_images(spark, 6, seed=11)
    rows = augment_images(imgs, ops=("hflip",), with_bytes=True).collect()
    src = {r.image_id: r for r in imgs.collect()}
    for r in rows:
        pix = decode(r.bytes, r.w, r.h, "rgb8")
        orig = decode(src[r.image_id].bytes, src[r.image_id].w,
                      src[r.image_id].h, src[r.image_id].fmt)
        assert np.array_equal(pix, apply_op(orig, "hflip"))
        assert r.bytes == encode_rgb8(apply_op(orig, "hflip"))


def test_augment_is_single_arrow_stage(spark):
    from tests.test_plans import plan_of
    imgs = gen_images(spark, 8, seed=11)
    plan = plan_of(augment_images(imgs), "simple")
    # one MapInPandas from the generator input + exactly ONE added by
    # augment_images; zero shuffles anywhere
    assert plan.count("MapInPandas") == 2
    assert "Exchange" not in plan


def test_golden_matches_engine(spark):
    import pandas as pd
    import __spark_entry__ as m
    golden = pd.read_parquet("/root/repo/oracle/golden/img_augment.parquet")
    got = (m.queries()["img_augment"](spark, "/root/testdata/sf0.001")
           .orderBy("image_id", "op").toPandas())
    exp = golden.sort_values(["image_id", "op"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
