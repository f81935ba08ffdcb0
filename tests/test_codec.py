"""C5/C6/C7 — codec roundtrip + pixel invariants (BASELINE.json:15:
decoded-pixel allclose, PSNR >= 40 dB for lossy, caption equality)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

from engine.image import codec
from engine.image.phash import hamming_col, phash64, phash_images
from engine.synth import gen_images_local


def _pix(seed, h=32, w=48):
    r = np.random.default_rng(seed)
    return r.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("shape", [(8, 8), (16, 16), (32, 48), (33, 47), (64, 64), (1, 1)])
def test_lossless_roundtrip(shape):
    pix = _pix(1, *shape)
    for fmt in ("rgb8", "png"):
        data = codec.encode(pix, fmt)
        out = codec.decode(data, shape[1], shape[0], fmt)
        np.testing.assert_array_equal(pix, out)


@pytest.mark.parametrize("shape", [(16, 16), (32, 48), (33, 47), (64, 64)])
def test_jq_psnr_invariant(shape):
    # worst case for a DCT codec is white noise; still must clear 40 dB
    pix = _pix(2, *shape)
    out = codec.decode(codec.encode(pix, "jq"), shape[1], shape[0], "jq")
    assert codec.psnr(pix, out) >= 40.0


def test_jq_deterministic():
    pix = _pix(3)
    assert codec.encode(pix, "jq") == codec.encode(pix, "jq")
    a = codec.decode(codec.encode(pix, "jq"), 48, 32, "jq")
    b = codec.decode(codec.encode(pix, "jq"), 48, 32, "jq")
    np.testing.assert_array_equal(a, b)


def test_png_is_real_png():
    data = codec.encode(_pix(4), "png")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data[:40] and data[-8:-4] == b"IEND"


def test_golden_hashes_freeze_semantics():
    """Codec + phash outputs for a fixed input are frozen; a change here is
    a compatibility break of the tile/join contract tables."""
    pix = _pix(42, 16, 16)
    goldens = {
        "rgb8": "d0d2ff6e660514e7",
        "png": "c0a57002019f2b53",
        "jq": "385ec220b8d87098",
    }
    for fmt, want in goldens.items():
        got = hashlib.sha256(codec.encode(pix, fmt)).hexdigest()[:16]
        assert got == want, f"{fmt}: got {got}"


def test_phash_properties():
    pix = _pix(5, 64, 64)
    h1 = phash64(pix)
    assert isinstance(h1, int)
    # identical image -> identical hash
    assert phash64(pix.copy()) == h1
    # mild lossy recompression -> small hamming distance
    lossy = codec.decode(codec.encode(pix, "jq"), 64, 64, "jq")
    h2 = phash64(lossy)
    d = bin((h1 ^ h2) & ((1 << 64) - 1)).count("1")
    assert d <= 6
    # unrelated image -> large distance
    h3 = phash64(_pix(999, 64, 64))
    d2 = bin((h1 ^ h3) & ((1 << 64) - 1)).count("1")
    assert d2 >= 16


def test_phash_batch_matches_single():
    pics = [_pix(s, 32, 32) for s in range(8)]
    batch = phash_images(pics)
    for i, p in enumerate(pics):
        assert int(batch[i]) == phash64(p)


def test_decode_stats_spark(spark):
    pdf = gen_images_local(30)
    df = spark.createDataFrame(pdf)
    got = {r.image_id: r for r in codec.decode_stats(df).collect()}
    assert len(got) == 30
    for row in pdf.itertuples(index=False):
        pix = codec.decode(row.bytes, row.w, row.h, row.fmt).astype(np.float64)
        g = got[row.image_id]
        assert abs(g.mean_r - pix[:, :, 0].mean()) < 1e-9
        gray = pix @ np.array([0.299, 0.587, 0.114])
        assert abs(g.std_gray - gray.std()) < 1e-9


def test_hamming_prefilter_spark(spark):
    pdf = gen_images_local(60)
    df = spark.createDataFrame(pdf[["image_id", "phash"]])
    q = int(pdf["phash"].iloc[0])
    got = {r.image_id for r in
           df.filter(hamming_col("phash", q) <= 10).collect()}
    want = {
        row.image_id for row in pdf.itertuples(index=False)
        if bin((int(row.phash) ^ q) & ((1 << 64) - 1)).count("1") <= 10
    }
    assert got == want and pdf["image_id"].iloc[0] in got


def test_patch_tiling_identity_spark(spark):
    """C9 — patches tile each image EXACTLY: dims sum back to (h, w),
    patch pixel sums add up to the image's total, and each patch's rgb8
    bytes decode to the corresponding slice."""
    from engine.image.patches import extract_patches

    pdf = gen_images_local(24)
    df = spark.createDataFrame(pdf)
    G = 4
    rows = extract_patches(df, grid=G).collect()
    by_img: dict[str, list] = {}
    for r in rows:
        by_img.setdefault(r.image_id, []).append(r)
    assert len(by_img) == 24
    for src in pdf.itertuples(index=False):
        pix = codec.decode(src.bytes, src.w, src.h, src.fmt)
        got = by_img[src.image_id]
        assert len(got) == G * G
        assert sum(r.pix_sum for r in got) == int(pix.sum(dtype="int64"))
        assert sum(r.ph for r in got if r.gx == 0) == src.h
        assert sum(r.pw for r in got if r.gy == 0) == src.w
        for r in got:
            y0 = sum(q.ph for q in got if q.gx == 0 and q.gy < r.gy)
            x0 = sum(q.pw for q in got if q.gy == 0 and q.gx < r.gx)
            sl = pix[y0:y0 + r.ph, x0:x0 + r.pw]
            np.testing.assert_array_equal(
                codec.decode_rgb8(bytes(r.patch), r.pw, r.ph), sl)
            assert r.pix_min == int(sl.min()) and r.pix_max == int(sl.max())
