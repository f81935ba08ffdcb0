"""C-hr — Harris corner response stats vs a brute per-window
double-loop (explicit 3x3 Sobel + explicit 3x3 box structure tensor),
plus the transpose-invariance theorem (det and trace of the structure
tensor are invariant under gx<->gy swap), step-edge negativity, flat
zero, and the Spark operator's parity with the reference kernel."""

from __future__ import annotations

import numpy as np

from engine.image.harris import DEFAULT_THRESH, harris_np, image_harris

KX = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.int64)
KY = KX.T


def _brute(pix, thresh=DEFAULT_THRESH):
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < 5 or w < 5:
        return {"n_window": 0, "max_r16": 0, "n_corner": 0,
                "n_edge_like": 0}
    gx = np.zeros((h - 2, w - 2), np.int64)
    gy = np.zeros((h - 2, w - 2), np.int64)
    for i in range(1, h - 1):
        for j in range(1, w - 1):
            win = gray[i - 1:i + 2, j - 1:j + 2]
            gx[i - 1, j - 1] = int((win * KX).sum())
            gy[i - 1, j - 1] = int((win * KY).sum())
    mx, nc, ne = None, 0, 0
    gh, gw = gx.shape
    for i in range(1, gh - 1):
        for j in range(1, gw - 1):
            sxx = int((gx[i - 1:i + 2, j - 1:j + 2] ** 2).sum())
            syy = int((gy[i - 1:i + 2, j - 1:j + 2] ** 2).sum())
            sxy = int((gx[i - 1:i + 2, j - 1:j + 2]
                       * gy[i - 1:i + 2, j - 1:j + 2]).sum())
            r16 = 16 * (sxx * syy - sxy * sxy) - (sxx + syy) ** 2
            mx = r16 if mx is None else max(mx, r16)
            nc += r16 >= thresh
            ne += r16 < 0
    return {"n_window": (h - 4) * (w - 4), "max_r16": mx,
            "n_corner": nc, "n_edge_like": ne}


def test_kernel_matches_brute_random():
    rng = np.random.default_rng(17)
    for shape in [(5, 5), (5, 9), (8, 6), (12, 12)]:
        pix = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert harris_np(pix) == _brute(pix), shape


def test_flat_and_tiny_images():
    flat = np.full((10, 10, 3), 123, dtype=np.uint8)
    assert harris_np(flat) == {"n_window": 36, "max_r16": 0,
                               "n_corner": 0, "n_edge_like": 0}
    tiny = np.zeros((4, 7, 3), dtype=np.uint8)
    assert harris_np(tiny)["n_window"] == 0


def test_step_edge_never_fires_corner():
    """A pure vertical step: gy = 0 everywhere, so Sxy = Syy = 0 and
    r16 = -Sxx^2 <= 0 — edges must not count as corners."""
    pix = np.zeros((10, 12, 3), dtype=np.uint8)
    pix[:, 6:, :] = 200
    s = harris_np(pix)
    assert s["n_corner"] == 0
    assert s["max_r16"] <= 0
    assert s["n_edge_like"] > 0


def test_corner_fires_positive():
    """A bright quadrant corner inside a dark field produces a strictly
    positive response somewhere (the classical Harris motivation)."""
    pix = np.zeros((16, 16, 3), dtype=np.uint8)
    pix[8:, 8:, :] = 255
    s = harris_np(pix)
    assert s["max_r16"] > 0


def test_transpose_invariance_theorem():
    """Transposing the image swaps gx<->gy, leaving det(M), trace(M)
    and hence every r16 unchanged (the response field transposes):
    all four stats must be identical."""
    rng = np.random.default_rng(23)
    for _ in range(5):
        pix = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
        assert harris_np(pix) == harris_np(pix.transpose(1, 0, 2))


def test_spark_operator_matches_kernel(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images
    imgs = gen_images(spark, 40, seed=42)
    got = {r.image_id: (r.n_window, r.max_r16, r.n_corner, r.n_edge_like)
           for r in image_harris(imgs).collect()}
    for r in imgs.collect():
        s = harris_np(decode(r.bytes, int(r.w), int(r.h), r.fmt))
        assert got[r.image_id] == (s["n_window"], s["max_r16"],
                                   s["n_corner"], s["n_edge_like"])
