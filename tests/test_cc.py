"""Per-image connected-component labeling (engine/image/cc.py):
scanline union-find vs BFS flood fill, structural identities, and the
distributed pass.
"""

from __future__ import annotations

import numpy as np

from engine.image.cc import (label_stats, label_stats_brute,
                             image_components)
from engine.synth import gen_images


def _img(mask01):
    """binary mask -> white/black rgb8 pixel array."""
    m = np.asarray(mask01, dtype=np.uint8)
    return np.repeat((m * 255)[:, :, None], 3, axis=2)


def test_known_patterns():
    # one solid blob
    assert label_stats(_img(np.ones((5, 7)))) == (1, 35, 35)
    # empty
    assert label_stats(_img(np.zeros((4, 4)))) == (0, 0, 0)
    # checkerboard: every fg pixel is its own 4-connected blob
    b = np.indices((6, 6)).sum(axis=0) % 2
    assert label_stats(_img(b)) == (18, 1, 18)
    # U shape: one blob through the bottom bend
    u = np.array([[1, 0, 1],
                  [1, 0, 1],
                  [1, 1, 1]])
    assert label_stats(_img(u)) == (1, 7, 7)
    # two bars
    bars = np.array([[1, 1, 0, 1, 1]])
    assert label_stats(_img(bars)) == (2, 2, 4)


def test_union_find_matches_bfs_randomized():
    rng = np.random.default_rng(7)
    for _ in range(25):
        h, w = rng.integers(1, 24, size=2)
        mask = rng.random((h, w)) < rng.uniform(0.2, 0.8)
        a = label_stats(_img(mask))
        b = label_stats_brute(_img(mask))
        assert a == b
        # conservation: no blob exceeds fg, fg == mask sum
        n, mx, fg = a
        assert fg == int(mask.sum()) and mx <= fg and (n == 0) == (fg == 0)


def test_distributed_matches_kernel(spark):
    imgs = gen_images(spark, 24, seed=31)
    from engine.image.codec import decode
    src = {r["image_id"]: r for r in imgs.collect()}
    rows = image_components(imgs).collect()
    assert {r["image_id"] for r in rows} == set(src)
    for r in rows:
        s = src[r["image_id"]]
        pix = decode(s["bytes"], int(s["w"]), int(s["h"]), s["fmt"])
        assert (r["n_blobs"], r["max_blob"], r["fg_pixels"]) == \
            label_stats_brute(pix)
