"""C19 — 3x3 median filter (engine/image/median.py): brute per-pixel
9-element-sort reference, the spike-erasure property that separates
the median from every linear filter, constant/gradient closed forms,
and the distributed pass vs the reference kernel."""
from __future__ import annotations

import numpy as np
import pytest

from engine.image.median import image_median3, median3_np


def _brute(gray):
    h, w = gray.shape
    med = np.zeros((h - 2, w - 2), dtype=np.int64)
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            med[y - 1, x - 1] = sorted(
                gray[y + dy, x + dx]
                for dy in (-1, 0, 1) for dx in (-1, 0, 1))[4]
    return med


def _to_pix(gray):
    """Lift a gray int array into an rgb8 (h,w,3) with r=g=b=v//3 + rem
    spread — easier: r=v, g=b=0 requires v<=255."""
    h, w = gray.shape
    pix = np.zeros((h, w, 3), dtype=np.uint8)
    pix[..., 0] = gray
    return pix


def test_median3_matches_brute_random():
    rng = np.random.RandomState(7)
    gray = rng.randint(0, 256, size=(9, 11)).astype(np.int64)
    s = median3_np(_to_pix(gray))
    med = _brute(gray)
    center = gray[1:-1, 1:-1]
    assert s["sum_med"] == int(med.sum())
    assert s["n_changed"] == int((med != center).sum())
    assert s["max_absdiff"] == int(np.abs(med - center).max())
    assert s["n_interior"] == 7 * 9


def test_median3_constant_and_spike_closed_forms():
    # constant image: median == center everywhere
    gray = np.full((6, 6), 40, dtype=np.int64)
    s = median3_np(_to_pix(gray))
    assert (s["n_changed"], s["max_absdiff"]) == (0, 0)
    assert s["sum_med"] == 40 * 16
    # a single interior spike is ERASED (its 8 neighbors outvote it)
    # and no neighboring window is perturbed (the spike is at most
    # 1 of their 9 values)
    gray2 = np.full((7, 7), 10, dtype=np.int64)
    gray2[3, 3] = 250
    s2 = median3_np(_to_pix(gray2))
    assert s2["n_changed"] == 1          # only the spike pixel changes
    assert s2["max_absdiff"] == 240      # 250 -> 10
    assert s2["sum_med"] == 10 * 25      # as if the spike never existed


def test_median3_small_images_no_interior():
    assert median3_np(_to_pix(np.zeros((2, 5), dtype=np.int64))) == {
        "sum_med": 0, "n_changed": 0, "max_absdiff": 0, "n_interior": 0}


def test_image_median3_distributed_matches_kernel(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images
    imgs = gen_images(spark, 24, seed=42)
    got = {r.image_id: (r.sum_med, r.n_changed, r.max_absdiff,
                        r.n_interior)
           for r in image_median3(imgs).collect()}
    for r in imgs.collect():
        s = median3_np(decode(r.bytes, r.w, r.h, r.fmt))
        assert got[r.image_id] == (s["sum_med"], s["n_changed"],
                                   s["max_absdiff"], s["n_interior"])
    assert len(got) == 24
