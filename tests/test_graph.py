"""N1/N2 — integer PageRank and triangle counting vs sequential
references."""

from __future__ import annotations

import random

import pytest

from engine.graph import (pagerank_int, pagerank_py, triangle_count,
                          triangles_py)


def _edf(spark, edges, parts=None):
    df = spark.createDataFrame(edges, "src long, dst long")
    return df.repartition(parts) if parts else df


def test_pagerank_matches_reference_random(spark):
    rng = random.Random(23)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(150)]
    exp = pagerank_py(edges, iters=4)
    for parts in (1, 8):
        got = {r.node: r.rank
               for r in pagerank_int(_edf(spark, edges, parts),
                                     iters=4).collect()}
        assert got == exp


def test_pagerank_star_hub_dominates(spark):
    edges = [(0, i) for i in range(1, 9)]
    got = {r.node: r.rank for r in pagerank_int(_edf(spark, edges)).collect()}
    assert got == pagerank_py(edges)
    assert got[0] > max(got[i] for i in range(1, 9))
    # leaves are symmetric: identical ranks
    assert len({got[i] for i in range(1, 9)}) == 1


def test_pagerank_mass_conservation_bound(spark):
    """Floors only shed mass: total rank never exceeds the exact-
    rational fixed total n*s0 after any round."""
    edges = [(i, (i + 1) % 10) for i in range(10)]  # 10-cycle
    got = {r.node: r.rank for r in pagerank_int(_edf(spark, edges)).collect()}
    s0 = 1 << 30
    assert sum(got.values()) <= 10 * s0
    # cycle is vertex-transitive: all ranks equal
    assert len(set(got.values())) == 1


def test_pagerank_guards(spark):
    with pytest.raises(Exception):
        pagerank_int(_edf(spark, [(1, 1)]))  # only a self-loop -> empty
    with pytest.raises(ValueError):
        pagerank_int(_edf(spark, [(0, 1)]), s0=1 << 62)


def test_triangles_k4_and_path(spark):
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = {r.node: r.n_triangles
           for r in triangle_count(_edf(spark, k4)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}
    path = [(i, i + 1) for i in range(6)]
    assert triangle_count(_edf(spark, path)).count() == 0


def test_triangles_random_matches_brute(spark):
    rng = random.Random(31)
    edges = [(rng.randrange(40), rng.randrange(40)) for _ in range(160)]
    exp = triangles_py(edges)
    for parts in (1, 8):
        got = {r.node: r.n_triangles
               for r in triangle_count(_edf(spark, edges, parts)).collect()}
        assert got == exp


def test_triangles_duplicate_and_reversed_edges_collapse(spark):
    tri = [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (0, 2), (2, 0)]
    got = {r.node: r.n_triangles
           for r in triangle_count(_edf(spark, tri)).collect()}
    assert got == {0: 1, 1: 1, 2: 1}
