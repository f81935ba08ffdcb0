"""C12 — Sobel gradient stats vs a brute 3x3 kernel double-loop."""

from __future__ import annotations

import numpy as np

from engine.image.sobel import DEFAULT_THRESH, image_sobel, sobel_np

KX = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
KY = KX.T


def _brute(pix, thresh=DEFAULT_THRESH):
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < 3 or w < 3:
        return {"edge_energy": 0, "max_grad": 0, "n_edge": 0,
                "n_interior": 0}
    energy = mx = ne = 0
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            win = gray[i - 1:i + 2, j - 1:j + 2]
            g = abs(int((win * KX).sum())) + abs(int((win * KY).sum()))
            energy += g
            mx = max(mx, g)
            ne += g >= thresh
    return {"edge_energy": energy, "max_grad": mx, "n_edge": ne,
            "n_interior": (h - 2) * (w - 2)}


def test_kernel_matches_brute_random():
    rng = np.random.default_rng(13)
    for shape in [(3, 3), (3, 7), (8, 5), (16, 16)]:
        pix = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert sobel_np(pix) == _brute(pix), shape


def test_flat_image_has_zero_gradient():
    pix = np.full((10, 10, 3), 77, dtype=np.uint8)
    s = sobel_np(pix)
    assert s == {"edge_energy": 0, "max_grad": 0, "n_edge": 0,
                 "n_interior": 64}


def test_vertical_step_edge():
    """A hard vertical step: |gx| = 4*delta on the two columns adjacent
    to the step, gy = 0 everywhere."""
    pix = np.zeros((6, 8, 3), dtype=np.uint8)
    pix[:, 4:, :] = 100  # gray step 0 -> 300
    s = sobel_np(pix)
    assert s["max_grad"] == 4 * 300
    # two interior columns see the step, each (h-2) pixels tall
    assert s["edge_energy"] == 2 * 4 * (6 - 2) * 300
    assert s == _brute(pix)


def test_too_small_image():
    pix = np.zeros((2, 5, 3), dtype=np.uint8)
    assert sobel_np(pix)["n_interior"] == 0


def test_distributed_matches_local(spark):
    from engine.synth import gen_images
    from engine.image.codec import decode

    imgs = gen_images(spark, 24, seed=7)
    rows = {r.image_id: r for r in image_sobel(imgs).collect()}
    for r in imgs.collect():
        exp = sobel_np(decode(r.bytes, r.w, r.h, r.fmt))
        got = rows[r.image_id]
        assert {k: getattr(got, k) for k in exp} == exp, r.image_id
