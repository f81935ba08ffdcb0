"""C21 — rotation-canonical pHash (engine/image/phash.py::
phash_rot_canonical): the orbit-invariance theorem (an image and its
rot90 copies share the canonical hash), the rot-commutes identity
(hashing a rotated decode equals the orbit's next hash), and
distributed-vs-kernel parity."""
from __future__ import annotations

import numpy as np

from engine.image.augment import apply_op
from engine.image.codec import decode
from engine.image.phash import phash64, phash_rot_canonical


def _orbit(pix):
    hs = []
    p = pix
    for _ in range(4):
        hs.append(int(phash64(p)) & 0xFFFFFFFFFFFFFFFF)
        p = np.rot90(p, axes=(0, 1))
    return hs


def test_orbit_invariance_and_rot_commutes(spark):
    from engine.synth import gen_images
    imgs = gen_images(spark, 12, seed=42).collect()
    for r in imgs:
        pix = decode(r.bytes, r.w, r.h, r.fmt)
        orbit = _orbit(pix)
        canon = min(orbit)
        # rotating the image once shifts the orbit and keeps the
        # canonical value
        rot = apply_op(pix, "rot90")
        orbit_r = _orbit(rot)
        assert orbit_r == orbit[1:] + orbit[:1]
        assert min(orbit_r) == canon


def test_distributed_matches_kernel_and_signed_encoding(spark):
    from engine.synth import gen_images
    imgs = gen_images(spark, 16, seed=42)
    got = {r.image_id: r for r in phash_rot_canonical(imgs).collect()}
    for r in imgs.collect():
        pix = decode(r.bytes, r.w, r.h, r.fmt)
        orbit = _orbit(pix)
        row = got[r.image_id]
        for k, h in zip(("ph0", "ph90", "ph180", "ph270"), orbit):
            assert (row[k] & 0xFFFFFFFFFFFFFFFF
                    if row[k] >= 0 else row[k] + (1 << 64)) == h
        canon = min(orbit)
        rc = row.ph_canonical
        assert (rc if rc >= 0 else rc + (1 << 64)) == canon
        # the base-table phash column agrees with orientation 0
        assert (row.ph0 if row.ph0 >= 0
                else row.ph0 + (1 << 64)) == orbit[0]
    assert len(got) == 16
