"""r5 — integer self-template SSD matching
(engine/image/template.py::template_ssd_np / image_template_ssd):
brute double-loop parity, the min==0-at-center guarantee, planted
disjoint duplicates (first match moves, second_ssd collapses to 0),
flat-image saturation, tiny-image arm, distributed==local parity."""

from __future__ import annotations

import numpy as np

from engine.image.template import T, image_template_ssd, template_ssd_np


def _brute(pix):
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < T or w < T:
        return {"first_u": -1, "first_v": -1, "n_exact": 0,
                "second_ssd": -1}
    cv, cu = (h - T) // 2, (w - T) // 2
    tmpl = gray[cv:cv + T, cu:cu + T]
    first, n_exact, second = None, 0, None
    for v in range(h - T + 1):
        for u in range(w - T + 1):
            s = int(((gray[v:v + T, u:u + T] - tmpl) ** 2).sum())
            if s == 0:
                n_exact += 1
                if first is None:
                    first = (u, v)
            if max(abs(v - cv), abs(u - cu)) >= T:
                second = s if second is None else min(second, s)
    return {"first_u": first[0], "first_v": first[1],
            "n_exact": n_exact,
            "second_ssd": -1 if second is None else second}


def test_kernel_matches_brute_random():
    rng = np.random.default_rng(61)
    for shape in [(8, 8), (9, 14), (12, 11), (16, 16)]:
        pix = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert template_ssd_np(pix) == _brute(pix), shape


def test_center_match_guarantee_random():
    """Self-template: SSD at the center anchor is zero, so the first
    match is at-or-before the center and n_exact >= 1."""
    rng = np.random.default_rng(67)
    for _ in range(5):
        pix = rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
        s = template_ssd_np(pix)
        cv, cu = (20 - T) // 2, (24 - T) // 2
        assert s["n_exact"] >= 1
        assert (s["first_v"], s["first_u"]) <= (cv, cu)


def test_planted_disjoint_duplicate():
    """Copying the center patch to the origin makes (0,0) the first
    match and collapses the distinctiveness margin to zero."""
    rng = np.random.default_rng(71)
    pix = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    cv = cu = (24 - T) // 2
    pix[0:T, 0:T, :] = pix[cv:cv + T, cu:cu + T, :]
    s = template_ssd_np(pix)
    assert (s["first_u"], s["first_v"]) == (0, 0)
    assert s["n_exact"] >= 2
    assert s["second_ssd"] == 0
    assert s == _brute(pix)


def test_flat_image_saturates():
    pix = np.full((16, 40, 3), 99, dtype=np.uint8)
    s = template_ssd_np(pix)
    assert (s["first_u"], s["first_v"]) == (0, 0)
    assert s["n_exact"] == (16 - T + 1) * (40 - T + 1)
    assert s["second_ssd"] == 0
    # and the no-far-offset arm: a window too small for any offset
    # Chebyshev >= T from the center anchor reports -1
    small = np.full((16, 20, 3), 99, dtype=np.uint8)
    assert template_ssd_np(small)["second_ssd"] == -1
    assert template_ssd_np(small) == _brute(small)


def test_tiny_image_arm():
    pix = np.zeros((7, 40, 3), dtype=np.uint8)
    assert template_ssd_np(pix) == {"first_u": -1, "first_v": -1,
                                    "n_exact": 0, "second_ssd": -1}


def test_spark_operator_matches_kernel(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images
    imgs = gen_images(spark, 40, seed=42)
    got = {r.image_id: (r.first_u, r.first_v, r.n_exact, r.second_ssd)
           for r in image_template_ssd(imgs).collect()}
    for r in imgs.collect():
        s = template_ssd_np(decode(r.bytes, int(r.w), int(r.h), r.fmt))
        assert got[r.image_id] == (s["first_u"], s["first_v"],
                                   s["n_exact"], s["second_ssd"])
