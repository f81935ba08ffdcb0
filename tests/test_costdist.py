"""C-cd — cost-distance surface (engine/geo/raster.py::cost_distance)
vs a sequential Bellman-Ford reference over the same derived grid
graph, plus closed forms for the corridor and barrier contracts."""

from __future__ import annotations

import random

from engine.geo.raster import cost_distance
from engine.graph import sssp_py


def _pix_df(spark, cells):
    rows = [(gx, gy, w) for (gx, gy), w in sorted(cells.items())]
    return spark.createDataFrame(rows, "gx long, gy long, w long")


def _ref(cells, grid, src_pred, max_hops, ortho=5, diag=7):
    edges = []
    for (gx, gy), w in cells.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nb = (gx + dx, gy + dy)
                if nb in cells:
                    fac = ortho if dx == 0 or dy == 0 else diag
                    edges.append((gx * grid + gy, nb[0] * grid + nb[1],
                                  (w + cells[nb]) * fac))
    sources = [gx * grid + gy for (gx, gy) in cells if src_pred((gx, gy))]
    d = sssp_py(edges, sources, max_hops=max_hops)
    return {(n // grid, n % grid): c for n, c in d.items()}


def test_costdist_matches_reference_random(spark):
    rng = random.Random(41)
    cells = {(rng.randrange(12), rng.randrange(12)): rng.randrange(1, 9)
             for _ in range(70)}
    got = {(r.gx, r.gy): r.cost
           for r in cost_distance(_pix_df(spark, cells), grid=12,
                                  source_pred="gx < 3",
                                  max_hops=5).collect()}
    assert got == _ref(cells, 12, lambda c: c[0] < 3, 5)


def test_costdist_uniform_corridor_closed_form(spark):
    # A 1-wide east-west corridor of uniform cost 2: step cost
    # (2+2)*5 = 20 per orthogonal hop, so cell k east of the source
    # costs 20k.
    cells = {(x, 5): 2 for x in range(10)}
    got = {(r.gx, r.gy): r.cost
           for r in cost_distance(_pix_df(spark, cells), grid=16,
                                  source_pred="gx = 0",
                                  max_hops=9).collect()}
    assert got == {(x, 5): 20 * x for x in range(10)}


def test_costdist_barrier_blocks(spark):
    # Absent cells are impassable: a gap in the corridor strands the
    # far side (never reported, even within the hop budget).
    cells = {(x, 0): 1 for x in range(8) if x != 4}
    got = {(r.gx, r.gy): r.cost
           for r in cost_distance(_pix_df(spark, cells), grid=8,
                                  source_pred="gx = 0",
                                  max_hops=7).collect()}
    assert got == {(x, 0): 10 * x for x in range(4)}


def test_costdist_diagonal_vs_detour(spark):
    # 2x2 block of cost 1: the diagonal step (1+1)*7 = 14 beats the
    # two-orthogonal detour (1+1)*5 + (1+1)*5 = 20.
    cells = {(0, 0): 1, (1, 0): 1, (0, 1): 1, (1, 1): 1}
    got = {(r.gx, r.gy): r.cost
           for r in cost_distance(_pix_df(spark, cells), grid=4,
                                  source_pred="gx = 0 AND gy = 0",
                                  max_hops=3).collect()}
    assert got == {(0, 0): 0, (1, 0): 10, (0, 1): 10, (1, 1): 14}


def test_costdist_hop_bound_is_respected(spark):
    cells = {(x, 0): 1 for x in range(10)}
    got = {(r.gx, r.gy): r.cost
           for r in cost_distance(_pix_df(spark, cells), grid=16,
                                  source_pred="gx = 0",
                                  max_hops=3).collect()}
    assert got == {(x, 0): 10 * x for x in range(4)}
