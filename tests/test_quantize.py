"""C13 — fixed-cube color quantization vs a brute per-pixel kernel."""

from __future__ import annotations

import numpy as np

from engine.image.quantize import LEVEL_W, N_LEVELS, image_palette, quantize_np


def _brute(pix):
    out = {}
    h, w, _ = pix.shape
    for i in range(h):
        for j in range(w):
            r, g, b = (int(pix[i, j, k]) // LEVEL_W for k in range(3))
            idx = r * N_LEVELS * N_LEVELS + g * N_LEVELS + b
            out[idx] = out.get(idx, 0) + 1
    return out


def test_kernel_matches_brute_random():
    rng = np.random.default_rng(41)
    for shape in [(1, 1), (5, 7), (16, 16)]:
        pix = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert quantize_np(pix) == _brute(pix), shape


def test_counts_conserve_pixels():
    rng = np.random.default_rng(43)
    pix = rng.integers(0, 256, size=(12, 9, 3), dtype=np.uint8)
    assert sum(quantize_np(pix).values()) == 12 * 9


def test_solid_color_single_bin():
    pix = np.full((8, 8, 3), 200, dtype=np.uint8)
    q = 200 // LEVEL_W
    assert quantize_np(pix) == {q * 21: 64}  # 21 = 16 + 4 + 1


def test_distributed_matches_local_and_dominant_flag(spark):
    from engine.image.codec import decode
    from engine.synth import gen_images

    imgs = gen_images(spark, 20, seed=3)
    rows = image_palette(imgs).collect()
    per = {}
    for r in rows:
        per.setdefault(r.image_id, []).append(r)
    for r in imgs.collect():
        exp = quantize_np(decode(r.bytes, r.w, r.h, r.fmt))
        got = {x.color_idx: x.n_pixels for x in per[r.image_id]}
        assert got == exp, r.image_id
        dom = [x for x in per[r.image_id] if x.is_dominant]
        assert len(dom) == 1
        best = min(exp.items(), key=lambda kv: (-kv[1], kv[0]))
        assert (dom[0].color_idx, dom[0].n_pixels) == best
