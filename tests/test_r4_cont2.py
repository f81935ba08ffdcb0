"""r4 continuation batch 2: img_histogram, icelite WAP driver key.

(Branch/WAP unit tests live in tests/test_icelite.py; this file holds
the image-histogram kernel parity and the driver-key surfaces.)
"""

from __future__ import annotations

import numpy as np

from engine.image.codec import decode
from engine.image.histogram import (BIN_W, N_BINS, histogram_np,
                                    image_histograms)
from engine.synth import gen_images


def test_histogram_kernel_vs_brute():
    """histogram_np vs a per-pixel double loop on random images."""
    rng = np.random.default_rng(7)
    for _ in range(5):
        h, w = rng.integers(2, 12, size=2)
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got = histogram_np(pix)
        want = np.zeros(N_BINS, dtype=np.int64)
        for y in range(h):
            for x in range(w):
                lum = int(pix[y, x, 0]) + int(pix[y, x, 1]) + int(pix[y, x, 2])
                want[min(lum // BIN_W, N_BINS - 1)] += 1
        assert (got == want).all()
    # boundary luminances: 0, 47, 48, 719, 720, 765 land in bins
    # 0, 0, 1, 14, 15, 15
    for lum, b in ((0, 0), (47, 0), (48, 1), (719, 14), (720, 15), (765, 15)):
        r = lum // 3
        px = np.full((1, 1, 3), r, dtype=np.uint8)
        px[0, 0, 0] += lum - 3 * r
        assert histogram_np(px)[b] == 1


def test_image_histograms_distributed(spark):
    """Distributed pass == per-image kernel; conservation + min/max."""
    imgs = gen_images(spark, 24, seed=42)
    rows = image_histograms(imgs).collect()
    src = {r["image_id"]: r for r in imgs.collect()}
    by_img: dict = {}
    for r in rows:
        by_img.setdefault(r["image_id"], []).append(r)
    assert set(by_img) == set(src)
    for iid, rs in by_img.items():
        s = src[iid]
        pix = decode(s["bytes"], int(s["w"]), int(s["h"]), s["fmt"])
        want = histogram_np(pix)
        lum = pix.astype(np.int64).sum(axis=2)
        got = np.zeros(N_BINS, dtype=np.int64)
        for r in rs:
            got[r["bin"]] = r["n_pixels"]
            assert r["lum_min"] == int(lum.min())
            assert r["lum_max"] == int(lum.max())
        assert (got == want).all()
        assert got.sum() == int(s["w"]) * int(s["h"])   # conservation
