"""r5 — per-image GLCM texture stats
(engine/image/glcm.py::glcm_stats_np / image_glcm): brute dict-loop
parity, the symmetry / pair-count closed forms, flat-image collapse
(all mass on one diagonal cell), checkerboard contrast closed form,
distributed==local parity."""

from __future__ import annotations

import numpy as np

from engine.image.glcm import N_LEVELS, glcm_stats_np, image_glcm


def _brute(pix):
    lev = pix.astype(np.int64).sum(axis=2) // 96
    h, w = lev.shape
    c = {}
    for v in range(h):
        for u in range(w):
            for dv, du in ((0, 1), (1, 0)):
                if v + dv < h and u + du < w:
                    a, b = int(lev[v, u]), int(lev[v + dv, u + du])
                    c[(a, b)] = c.get((a, b), 0) + 1
                    c[(b, a)] = c.get((b, a), 0) + 1
    return {
        "n_pairs": sum(c.values()),
        "contrast_sum": sum(n * (i - j) ** 2 for (i, j), n in c.items()),
        "energy_num": sum(n * n for n in c.values()),
        "homog_x840": sum(n * (840 // (1 + abs(i - j)))
                          for (i, j), n in c.items()),
        "diag_pairs": sum(n for (i, j), n in c.items() if i == j),
    }


def test_kernel_matches_brute_random():
    rng = np.random.default_rng(83)
    for shape in [(1, 1), (1, 7), (6, 1), (5, 9), (16, 16)]:
        pix = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert glcm_stats_np(pix) == _brute(pix), shape


def test_pair_count_closed_form():
    rng = np.random.default_rng(89)
    for h, w in [(4, 4), (3, 11), (12, 2)]:
        pix = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        s = glcm_stats_np(pix)
        assert s["n_pairs"] == 2 * (h * (w - 1) + (h - 1) * w)


def test_flat_image_collapses_to_one_cell():
    """Constant luminance: every pair lands on one diagonal cell, so
    contrast is 0, homogeneity saturates at 840*n, energy at n^2."""
    pix = np.full((10, 12, 3), 200, dtype=np.uint8)  # I=600 -> level 6
    s = glcm_stats_np(pix)
    n = s["n_pairs"]
    assert s["contrast_sum"] == 0
    assert s["diag_pairs"] == n
    assert s["homog_x840"] == 840 * n
    assert s["energy_num"] == n * n


def test_checkerboard_contrast_closed_form():
    """Alternating level-0 / level-7 checkerboard: every adjacent pair
    crosses the full range, contrast = 49 * n_pairs, diag = 0."""
    h, w = 8, 8
    pix = np.zeros((h, w, 3), dtype=np.uint8)
    vv, uu = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    pix[(vv + uu) % 2 == 1] = 255  # I=765 -> level 7; else level 0
    s = glcm_stats_np(pix)
    assert s["contrast_sum"] == 49 * s["n_pairs"]
    assert s["diag_pairs"] == 0
    assert s["homog_x840"] == (840 // 8) * s["n_pairs"]


def test_symmetry_invariance_under_transpose():
    """The symmetric GLCM of the transposed image is the same matrix
    (offsets swap roles), so every stat is transpose-invariant."""
    rng = np.random.default_rng(97)
    pix = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    assert glcm_stats_np(pix) == glcm_stats_np(
        np.ascontiguousarray(pix.transpose(1, 0, 2)))


def test_distributed_matches_local(spark):
    from engine.synth import gen_images, gen_images_local
    from engine.image.codec import decode as dec

    df = image_glcm(gen_images(spark, 24, seed=42)).toPandas() \
        .set_index("image_id").sort_index()
    loc = gen_images_local(24, seed=42)
    for r in loc.itertuples(index=False):
        s = glcm_stats_np(dec(r.bytes, int(r.w), int(r.h), r.fmt))
        row = df.loc[r.image_id]
        for k, v in s.items():
            assert int(row[k]) == v, (r.image_id, k)


def test_levels_cover_full_range():
    assert 765 // 96 == N_LEVELS - 1
    assert 0 // 96 == 0
