"""HOG-lite octant histogram (engine/image/orient.py): independent
atan2-based reference with explicit boundary handling, synthetic
gradient closed forms, rotation consistency, and distributed parity."""
from __future__ import annotations

import math

import numpy as np

from engine.image.orient import image_orient_hist, orient_hist_np


def _octant_ref(gx, gy):
    """Independent formulation: float atan2 for generic angles,
    explicit integer handling of the 8 exact boundaries (multiples of
    45° occur iff gx==0, gy==0, or |gx|==|gy| — decided exactly)."""
    if gx == 0 and gy == 0:
        return None
    if gy == 0:
        return 0 if gx > 0 else 4
    if gx == 0:
        return 2 if gy > 0 else 6
    if abs(gx) == abs(gy):
        if gx > 0 and gy > 0:
            return 1
        if gx < 0 < gy:
            return 3
        if gx < 0 and gy < 0:
            return 5
        return 7
    th = math.atan2(gy, gx) % (2 * math.pi)
    return int(th // (math.pi / 4))


def test_octant_rule_matches_atan2_reference_exhaustive():
    # every (gx, gy) in a grid, via a 3x3 image crafted per gradient?
    # cheaper: drive the kernel's binning logic through crafted
    # gradients by direct recomputation on 1-interior-pixel images is
    # awkward — instead check the vectorized rule against the
    # reference on the raw pair domain using the same numpy steps.
    import itertools

    for gx, gy in itertools.product(range(-6, 7), repeat=2):
        if gx == 0 and gy == 0:
            continue
        k = 0
        ax, ay = gx, gy
        if ay < 0:
            ax, ay, k = -ax, -ay, 4
        if ax <= 0:
            ax, ay, k = ay, -ax, k + 2
        k += 1 if ay >= ax else 0
        if gy == 0:
            k = 0 if gx > 0 else 4
        assert k == _octant_ref(gx, gy), (gx, gy)


def test_orient_hist_synthetic_gradients():
    # horizontal ramp: gx > 0, gy == 0 everywhere -> all bin 0
    w = h = 8
    pix = np.zeros((h, w, 3), dtype=np.uint8)
    pix[..., 0] = np.arange(w, dtype=np.uint8) * 10
    s = orient_hist_np(pix)
    assert s["o0"] == (w - 2) * (h - 2) and s["n_zero"] == 0
    # vertical ramp -> all bin 2 (gy > 0, gx == 0)
    pix2 = np.zeros((h, w, 3), dtype=np.uint8)
    pix2[..., 0] = (np.arange(h, dtype=np.uint8) * 10)[:, None]
    s2 = orient_hist_np(pix2)
    assert s2["o2"] == (w - 2) * (h - 2)
    # constant image -> all zero-gradient
    s3 = orient_hist_np(np.full((h, w, 3), 7, dtype=np.uint8))
    assert s3["n_zero"] == (w - 2) * (h - 2)
    assert all(s3[f"o{b}"] == 0 for b in range(8))
    # transpose swaps gx/gy: reflects bins across the 45° line —
    # bin 0 (east) <-> bin 2 (north) up to boundary membership; check
    # the ramp pair above realizes it
    assert s["o0"] == s2["o2"]


def test_orient_hist_random_matches_per_pixel_reference():
    rng = np.random.RandomState(3)
    pix = rng.randint(0, 256, size=(10, 12, 3)).astype(np.uint8)
    s = orient_hist_np(pix)
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    want = {f"o{b}": 0 for b in range(8)}
    zeros = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            gx = ((gray[y - 1, x + 1] + 2 * gray[y, x + 1]
                   + gray[y + 1, x + 1])
                  - (gray[y - 1, x - 1] + 2 * gray[y, x - 1]
                     + gray[y + 1, x - 1]))
            gy = ((gray[y + 1, x - 1] + 2 * gray[y + 1, x]
                   + gray[y + 1, x + 1])
                  - (gray[y - 1, x - 1] + 2 * gray[y - 1, x]
                     + gray[y - 1, x + 1]))
            b = _octant_ref(gx, gy)
            if b is None:
                zeros += 1
            else:
                want[f"o{b}"] += 1
    assert {k: v for k, v in s.items() if k != "n_zero"} == want
    assert s["n_zero"] == zeros


def test_image_orient_hist_distributed_matches_kernel(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images
    imgs = gen_images(spark, 16, seed=42)
    got = {r.image_id: tuple(r[f"o{b}"] for b in range(8))
           for r in image_orient_hist(imgs).collect()}
    for r in imgs.collect():
        s = orient_hist_np(decode(r.bytes, r.w, r.h, r.fmt))
        assert got[r.image_id] == tuple(s[f"o{b}"] for b in range(8))
    assert len(got) == 16
