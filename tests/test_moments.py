"""img_moments (late r4) — brute double-loop oracle for the vectorized
kernel, EXACT translation theorems for raw vs central moments, and
distributed == local parity."""

from __future__ import annotations

import numpy as np
import pytest

from engine.image.moments import MOMENT_COLS, image_moments, moments_np


def _brute(pix):
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    m = dict.fromkeys(("m00", "m10", "m01", "m11", "m20", "m02"), 0)
    for y in range(h):
        for x in range(w):
            i = int(gray[y, x])
            m["m00"] += i
            m["m10"] += x * i
            m["m01"] += y * i
            m["m11"] += x * y * i
            m["m20"] += x * x * i
            m["m02"] += y * y * i
    m["mu20n"] = m["m00"] * m["m20"] - m["m10"] ** 2
    m["mu02n"] = m["m00"] * m["m02"] - m["m01"] ** 2
    m["mu11n"] = m["m00"] * m["m11"] - m["m10"] * m["m01"]
    return m


@pytest.mark.parametrize("seed", range(4))
def test_kernel_matches_brute(seed):
    r = np.random.default_rng(seed)
    pix = r.integers(0, 256, (int(r.integers(2, 20)),
                              int(r.integers(2, 20)), 3), dtype=np.uint8)
    assert moments_np(pix) == _brute(pix)


def test_translation_theorems():
    """Pad-shift an image by (dx, dy): raw moments transform by the
    binomial law, central numerators are EXACTLY invariant."""
    r = np.random.default_rng(9)
    pix = r.integers(0, 256, (12, 17, 3), dtype=np.uint8)
    dx, dy = 5, 3
    shifted = np.zeros((12 + dy, 17 + dx, 3), np.uint8)
    shifted[dy:, dx:] = pix
    a, b = moments_np(pix), moments_np(shifted)
    assert b["m00"] == a["m00"]
    assert b["m10"] == a["m10"] + dx * a["m00"]
    assert b["m01"] == a["m01"] + dy * a["m00"]
    assert b["m20"] == a["m20"] + 2 * dx * a["m10"] + dx * dx * a["m00"]
    assert b["m02"] == a["m02"] + 2 * dy * a["m01"] + dy * dy * a["m00"]
    assert b["m11"] == (a["m11"] + dx * a["m01"] + dy * a["m10"]
                        + dx * dy * a["m00"])
    for c in ("mu20n", "mu02n", "mu11n"):
        assert b[c] == a[c]
    # positive semidefiniteness of the covariance numerators
    assert a["mu20n"] >= 0 and a["mu02n"] >= 0
    assert a["mu20n"] * a["mu02n"] >= a["mu11n"] ** 2


def test_distributed_matches_local(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images, gen_images_local

    imgs = gen_images(spark, 40, seed=42)
    got = {r.image_id: tuple(getattr(r, c) for c in MOMENT_COLS)
           for r in image_moments(imgs).collect()}
    assert len(got) == 40
    for row in gen_images_local(40, seed=42).itertuples(index=False):
        m = moments_np(decode(row.bytes, int(row.w), int(row.h), row.fmt))
        assert got[row.image_id] == tuple(m[c] for c in MOMENT_COLS)
