"""Hexbin index (C7c): kernel parity (Spark native expr == numpy
reference == brute-force argmin), hexagonal-neighborhood property, and
determinism of the tie rule."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from engine.geo.hexbin import (
    GRID_BITS, H_UNITS, W_UNITS, hex_neighbors, hexbin_counts, hexbin_np,
    with_hexbin,
)


def _rand_lonlat(rng, n):
    return (rng.uniform(-180, 180, n), rng.uniform(-90, 90, n))


def test_spark_matches_numpy_kernel(spark, rng):
    lon, lat = _rand_lonlat(rng, 4000)
    pdf = pd.DataFrame({"id": np.arange(4000), "lon": lon, "lat": lat})
    got = (with_hexbin(spark.createDataFrame(pdf), size=4)
           .orderBy("id").select("hx", "hy").toPandas())
    hx, hy = hexbin_np(lon, lat, size=4)
    assert (got["hx"].to_numpy() == hx).all()
    assert (got["hy"].to_numpy() == hy).all()


def test_assignment_is_true_nearest_center(rng):
    """Brute force: the assigned center must minimize squared distance
    over ALL lattice centers in a 5x5 neighborhood (ties -> grid A,
    then the kernel's deterministic pick)."""
    lon, lat = _rand_lonlat(rng, 2000)
    size, w, h = 4, W_UNITS * 4, H_UNITS * 4
    hx, hy = hexbin_np(lon, lat, size=size)
    n = float(1 << GRID_BITS)
    hi = np.int64((1 << GRID_BITS) - 1)
    gx = np.clip(np.floor((lon + 180.0) / 360.0 * n).astype(np.int64), 0, hi)
    gy = np.clip(np.floor((lat + 90.0) / 180.0 * n).astype(np.int64), 0, hi)
    for i in range(len(gx)):
        best = (gx[i] - hx[i]) ** 2 + (gy[i] - hy[i]) ** 2
        for di in range(-2, 3):
            for dj in range(-2, 3):
                for off in (0, 1):  # grid A / grid B
                    cx = (gx[i] // (2 * w) + di) * 2 * w + off * w
                    cy = (gy[i] // (2 * h) + dj) * 2 * h + off * h
                    d = (gx[i] - cx) ** 2 + (gy[i] - cy) ** 2
                    assert d >= best, (i, cx, cy, d, best)


def test_six_equidistant_neighbors():
    """The tessellation's defining hex property: ring-1 is SIX centers,
    all at the same distance (exact for the 1000/1732 aspect up to the
    0.05% sqrt(3) rational approximation)."""
    nb = hex_neighbors(size=1)
    assert len(nb) == 6
    dists = sorted(dx * dx + dy * dy for dx, dy in nb)
    # four diagonal neighbors at w^2+h^2, E/W at (2w)^2 — equal to
    # within 0.005% (the 1732/1000 ~ sqrt(3) rational approximation)
    diag = W_UNITS ** 2 + H_UNITS ** 2
    assert dists[:4] == [diag] * 4
    assert dists[4:] == [2000 ** 2] * 2
    assert abs(diag - 2000 ** 2) / 2000 ** 2 < 1e-4


def test_dense_grid_cells_touch_only_ring1(spark):
    """Bin a dense regular grid of points: every populated cell's
    adjacent populated cells (centers closer than the ring-2 distance)
    are exactly its 6 ring-1 neighbors — i.e. cells tile hexagonally,
    no rectangular 4/8-neighborhood artifacts."""
    size, w, h = 2, W_UNITS * 2, H_UNITS * 2
    xs = np.linspace(-5.0, 5.0, 260)
    ys = np.linspace(-5.0, 5.0, 260)
    lon, lat = map(np.ravel, np.meshgrid(xs, ys))
    hx, hy = hexbin_np(lon, lat, size=size)
    cells = set(zip(hx.tolist(), hy.tolist()))
    nb = set(hex_neighbors(size))
    interior = [c for c in cells
                if all((c[0] + dx, c[1] + dy) in cells for dx, dy in nb)]
    assert len(interior) > 50
    # ring-1 sits at ~(2w)^2, ring-2 starts at ~3(2w)^2: cut between
    ring2 = 2 * (2 * w) ** 2
    for cx, cy in interior[:60]:
        close = {(ox, oy) for (ox, oy) in cells
                 if 0 < (ox - cx) ** 2 + (oy - cy) ** 2 < ring2}
        assert close == {(cx + dx, cy + dy) for dx, dy in nb}, (cx, cy)


def test_counts_and_tie_determinism(spark, rng):
    lon, lat = _rand_lonlat(rng, 3000)
    pdf = pd.DataFrame({"lon": lon, "lat": lat})
    df = spark.createDataFrame(pdf)
    c1 = {(r.hx, r.hy): r.n for r in hexbin_counts(df, size=4).collect()}
    c2 = {(r.hx, r.hy): r.n
          for r in hexbin_counts(df.repartition(7), size=4).collect()}
    assert c1 == c2
    assert sum(c1.values()) == 3000
