"""str_pack / global_rank (late r4) — exact reference packing in pure
Python, rank-vs-sort equivalence under adversarial partitionings, and
page-capacity/MBR invariants."""

from __future__ import annotations

import numpy as np
import pytest

from engine.geo.strpack import global_rank, str_pack


def _boxes(n, seed=3, span=1 << 20):
    r = np.random.default_rng(seed)
    out = []
    for i in range(n):
        x, y = (int(v) for v in r.integers(0, span, 2))
        w, h = (int(v) for v in r.integers(1, 4096, 2))
        out.append((i, x, y, x + w, y + h))
    return out


def _ref_pack(rows, page_size, n_slabs=None):
    """Independent reference: plain sorted() slicing."""
    import math
    n = len(rows)
    n_pages = -(-n // page_size)
    s = n_slabs or (math.isqrt(n_pages - 1) + 1 if n_pages > 1 else 1)
    slab_rows = -(-n // s)
    pages_per_slab = -(-slab_rows // page_size)
    by_cx = sorted(rows, key=lambda r: (r[1] + r[3], r[0]))
    assign = {}
    for slab_i in range(s):
        slab = by_cx[slab_i * slab_rows:(slab_i + 1) * slab_rows]
        for j, r in enumerate(sorted(slab, key=lambda r: (r[2] + r[4],
                                                          r[0]))):
            assign[r[0]] = (slab_i, slab_i * pages_per_slab
                            + j // page_size)
    return assign


@pytest.mark.parametrize("n,ps", [(1, 4), (97, 8), (400, 16)])
def test_str_pack_matches_reference(spark, n, ps):
    rows = _boxes(n)
    df = spark.createDataFrame(
        rows, "id long, xmin long, ymin long, xmax long, ymax long")
    got = {r.id: r for r in str_pack(df, page_size=ps).collect()}
    want = _ref_pack(rows, ps)
    assert set(got) == {r[0] for r in rows}
    by_page = {}
    for i, x0, y0, x1, y1 in rows:
        assert (got[i].slab, got[i].page_id) == want[i]
        by_page.setdefault(want[i][1], []).append((x0, y0, x1, y1))
    for i in got:
        g = got[i]
        boxes = by_page[g.page_id]
        assert g.page_count == len(boxes) <= ps
        assert g.page_xmin == min(b[0] for b in boxes)
        assert g.page_ymin == min(b[1] for b in boxes)
        assert g.page_xmax == max(b[2] for b in boxes)
        assert g.page_ymax == max(b[3] for b in boxes)


def test_str_pack_partitioning_invariant(spark):
    """The packing is a pure function of the SET: 1-partition and
    37-partition inputs give identical assignments."""
    rows = _boxes(300, seed=5)
    a = spark.createDataFrame(
        rows, "id long, xmin long, ymin long, xmax long, ymax long") \
        .coalesce(1)
    b = spark.createDataFrame(
        rows, "id long, xmin long, ymin long, xmax long, ymax long") \
        .repartition(37)
    pa = {r.id: (r.slab, r.page_id) for r in str_pack(a, 8).collect()}
    pb = {r.id: (r.slab, r.page_id) for r in str_pack(b, 8).collect()}
    assert pa == pb


def test_global_rank_exact(spark):
    r = np.random.default_rng(7)
    vals = [(i, int(v)) for i, v in enumerate(r.integers(0, 50, 500))]
    df = spark.createDataFrame(vals, "id long, v long").repartition(13)
    got = {row.id: row._rank
           for row in global_rank(df, ["v", "id"]).collect()}
    for rank, (i, _) in enumerate(sorted(vals, key=lambda t: (t[1], t[0]))):
        assert got[i] == rank


def test_global_rank_no_single_partition_window(spark):
    """The plan must not contain a global (empty-partition) window —
    the whole point of the offset construction."""
    df = spark.createDataFrame([(1, 2)], "id long, v long")
    plan = global_rank(df, ["v", "id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    # every Window node must carry a partition spec (_pid or slab)
    import re
    for m in re.finditer(r"Window \[row_number", plan):
        seg = plan[m.start():m.start() + 200]
        assert "_pid" in seg
