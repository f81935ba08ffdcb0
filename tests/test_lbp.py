"""r5 — per-image LBP stats (engine/image/lbp.py::lbp_stats_np /
image_lbp): brute double-loop parity, the 58-uniform-patterns count,
flat-image closed form (all codes 255), gradient-image closed forms,
tiny-image arm, distributed==local parity."""

from __future__ import annotations

import numpy as np

from engine.image.lbp import OFFSETS, UNIFORM, image_lbp, lbp_stats_np


def _brute(pix):
    gray = pix.astype(np.int64).sum(axis=2)
    h, w = gray.shape
    if h < 3 or w < 3:
        return {"n_interior": 0, "n_uniform": 0, "modal_code": -1,
                "modal_count": 0, "code_sum": 0}
    hist = [0] * 256
    code_sum = 0
    for v in range(1, h - 1):
        for u in range(1, w - 1):
            code = 0
            for bit, (dv, du) in enumerate(OFFSETS):
                if gray[v + dv, u + du] >= gray[v, u]:
                    code |= 1 << bit
            hist[code] += 1
            code_sum += code
    modal_count = max(hist)
    modal = hist.index(modal_count)
    return {"n_interior": (h - 2) * (w - 2),
            "n_uniform": sum(n for c, n in enumerate(hist) if UNIFORM[c]),
            "modal_code": modal, "modal_count": modal_count,
            "code_sum": code_sum}


def test_uniform_pattern_count_is_58():
    assert int(UNIFORM.sum()) == 58


def test_kernel_matches_brute_random():
    rng = np.random.default_rng(101)
    for shape in [(3, 3), (2, 9), (5, 4), (12, 16)]:
        pix = rng.integers(0, 256, size=(*shape, 3), dtype=np.uint8)
        assert lbp_stats_np(pix) == _brute(pix), shape


def test_flat_image_all_codes_255():
    """Constant luminance: every neighbor >= center, so every code is
    255 (a uniform pattern: zero transitions)."""
    pix = np.full((6, 7, 3), 13, dtype=np.uint8)
    s = lbp_stats_np(pix)
    n = 4 * 5
    assert s == {"n_interior": n, "n_uniform": n, "modal_code": 255,
                 "modal_count": n, "code_sum": 255 * n}


def test_horizontal_gradient_closed_form():
    """Strictly increasing luminance left->right, constant per column:
    bits fire exactly for the three neighbors with du >= 0 beyond the
    center column plus the same-column pair — offsets with du > 0
    (bits 2,3,4) and du == 0 (bits 1,5) -> code 0b00111110 = 62,
    which has 2 transitions (uniform)."""
    w = 9
    col = np.arange(w, dtype=np.uint8) * 20
    pix = np.repeat(col[None, :, None], 3, axis=2)
    pix = np.repeat(pix, 5, axis=0)
    s = lbp_stats_np(pix)
    n = 3 * (w - 2)
    assert s == {"n_interior": n, "n_uniform": n, "modal_code": 62,
                 "modal_count": n, "code_sum": 62 * n}


def test_tiny_image_arm():
    pix = np.zeros((2, 2, 3), dtype=np.uint8)
    assert lbp_stats_np(pix)["modal_code"] == -1


def test_distributed_matches_local(spark):
    from engine.synth import gen_images, gen_images_local
    from engine.image.codec import decode as dec

    df = image_lbp(gen_images(spark, 24, seed=42)).toPandas() \
        .set_index("image_id").sort_index()
    loc = gen_images_local(24, seed=42)
    for r in loc.itertuples(index=False):
        s = lbp_stats_np(dec(r.bytes, int(r.w), int(r.h), r.fmt))
        row = df.loc[r.image_id]
        for k, v in s.items():
            assert int(row[k]) == v, (r.image_id, k)
