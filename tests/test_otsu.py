"""Otsu threshold (engine/image/otsu.py) vs an INDEPENDENT
Fraction-arithmetic brute oracle (exact rational sigma_B^2 argmax), plus
closed-form bimodal / constant cases and distributed==local parity.
The img_otsu driver key is golden-pinned (pixels aren't SQL-derivable);
this file is its independent verification."""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from engine.image.otsu import image_otsu, otsu_np


def _brute(pix: np.ndarray):
    """Independent oracle: exact rational between-class variance."""
    lum = pix.astype(np.int64).sum(axis=2).ravel()
    n = len(lum)
    best_t, best_v = None, Fraction(-1)
    for t in range(766):
        c0 = lum[lum <= t]
        c1 = lum[lum > t]
        if len(c0) == 0 or len(c1) == 0:
            continue
        w0, w1 = Fraction(len(c0), n), Fraction(len(c1), n)
        mu0 = Fraction(int(c0.sum()), len(c0))
        mu1 = Fraction(int(c1.sum()), len(c1))
        v = w0 * w1 * (mu0 - mu1) ** 2
        if v > best_v:
            best_t, best_v = t, v
    return best_t


def _img(arr):
    return np.asarray(arr, dtype=np.uint8)


def test_otsu_matches_rational_brute(rng):
    for _ in range(6):
        pix = _img(rng.integers(0, 256, size=(7, 9, 3)))
        t, n_bg, n_fg, s_bg, s_fg = otsu_np(pix)
        assert t == _brute(pix)
        lum = pix.astype(np.int64).sum(axis=2)
        assert n_bg == int((lum <= t).sum())
        assert n_fg == int((lum > t).sum())
        assert s_bg == int(lum[lum <= t].sum())
        assert s_fg == int(lum[lum > t].sum())


def test_otsu_bimodal_closed_form():
    # half the pixels at luminance 30 (rgb 10,10,10), half at 600
    # (rgb 200,200,200): sigma_B^2 is flat on t in [30, 599], ties go
    # to the smallest t -> exactly 30.
    pix = np.zeros((2, 4, 3), dtype=np.uint8)
    pix[:, 2:, :] = 200
    pix[:, :2, :] = 10
    t, n_bg, n_fg, s_bg, s_fg = otsu_np(pix)
    assert (t, n_bg, n_fg) == (30, 4, 4)
    assert (s_bg, s_fg) == (4 * 30, 4 * 600)


def test_otsu_constant_image_convention():
    pix = np.full((3, 3, 3), 7, dtype=np.uint8)
    t, n_bg, n_fg, s_bg, s_fg = otsu_np(pix)
    assert (t, n_bg, n_fg, s_bg, s_fg) == (21, 9, 0, 9 * 21, 0)


def test_otsu_distributed_matches_local(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images
    imgs = gen_images(spark, 40, seed=42)
    got = {r["image_id"]: (r["otsu_t"], r["n_bg"], r["n_fg"],
                           r["sum_bg"], r["sum_fg"])
           for r in image_otsu(imgs).collect()}
    rows = imgs.collect()
    assert len(got) == len(rows)
    for r in rows:
        pix = decode(r["bytes"], r["w"], r["h"], r["fmt"])
        assert got[r["image_id"]] == otsu_np(pix)


def test_otsu_repartition_invariant(spark):
    from engine.synth import gen_images
    imgs = gen_images(spark, 30, seed=7)
    a = sorted(map(tuple, image_otsu(imgs).collect()))
    b = sorted(map(tuple, image_otsu(imgs.repartition(11)).collect()))
    assert a == b
