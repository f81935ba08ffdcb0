"""Run-length stats (engine/image/rle.py) vs a brute sequential
double-loop oracle plus conservation laws and closed forms.  The
img_rle driver key is golden-pinned (pixels aren't SQL-derivable);
this file is its independent verification."""

from __future__ import annotations

import numpy as np

from engine.image.rle import image_rle, rle_np


def _brute(pix):
    lum = pix.astype(np.int64).sum(axis=2)
    runs = []
    for row in lum:
        cur, ln = int(row[0]), 0
        for v in row:
            if int(v) == cur:
                ln += 1
            else:
                runs.append(ln)
                cur, ln = int(v), 1
        runs.append(ln)
    return (int(lum.size), len(runs), max(runs),
            int(np.unique(lum).size))


def test_rle_matches_brute(rng):
    for _ in range(8):
        # low-cardinality palette to force real runs
        pix = (rng.integers(0, 3, size=(6, 11, 3)) * 40).astype(np.uint8)
        assert rle_np(pix) == _brute(pix)


def test_rle_conservation(rng):
    # sum of run lengths == n_pixels, checked via the brute list
    pix = (rng.integers(0, 2, size=(5, 9, 3)) * 100).astype(np.uint8)
    n_px, n_runs, max_run, _ = rle_np(pix)
    assert n_px == 45
    assert 1 <= max_run <= 9  # runs never wrap across rows
    assert n_runs >= 5  # at least one run per row


def test_rle_closed_forms():
    flat = np.full((4, 8, 3), 9, dtype=np.uint8)
    assert rle_np(flat) == (32, 4, 8, 1)  # one run per row
    stripes = np.zeros((2, 6, 3), dtype=np.uint8)
    stripes[:, 1::2, :] = 255  # alternating columns
    assert rle_np(stripes) == (12, 12, 1, 2)


def test_rle_distributed_matches_local(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images
    imgs = gen_images(spark, 40, seed=42)
    got = {r["image_id"]: (r["n_pixels"], r["n_runs"], r["max_run"],
                           r["n_distinct_lum"], r["rle_bytes"])
           for r in image_rle(imgs).collect()}
    for r in imgs.collect():
        pix = decode(r["bytes"], r["w"], r["h"], r["fmt"])
        n_px, n_runs, max_run, n_dist = rle_np(pix)
        assert got[r["image_id"]] == (n_px, n_runs, max_run, n_dist,
                                      2 * n_runs)
