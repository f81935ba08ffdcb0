"""r3 breadth ops: stream-stream join, embedding centroids, polygon
area/centroid, per-doc top terms — each against an independent
pure-Python oracle (SURVEY.md §5 strategy)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine import streaming as st
from engine.geo.layer import PolygonLayer
from engine.geo.measure import area_centroid, rings_df
from engine.ml.centroid import label_centroids
from engine.text.ops import top_terms


# ------------------------------------------------------ stream-stream join

def test_stream_stream_join_equals_batch(spark, sf_dir, tmp_path):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    st.write_event_chunks_df(ev.filter(F.col("event_type") == "click"),
                             str(tmp_path / "clicks"), n_chunks=3)
    st.write_event_chunks_df(ev.filter(F.col("event_type") == "view"),
                             str(tmp_path / "views"), n_chunks=3)
    out = st.stream_stream_join(
        st.read_event_stream(spark, str(tmp_path / "clicks" / "chunk-*")),
        st.read_event_stream(spark, str(tmp_path / "views" / "chunk-*")))
    table = st.run_stream_to_icelite(
        out, str(tmp_path / "tbl"), str(tmp_path / "ckpt"), mode="append")
    got = {(r.click_id, r.view_id)
           for r in table.scan(spark).collect()}

    # independent oracle: pandas merge + time filter
    pdf = ev.toPandas()
    c = pdf[pdf.event_type == "click"]
    v = pdf[pdf.event_type == "view"]
    m = c.merge(v, on="user_id", suffixes=("_c", "_v"))
    m = m[(m.ts_v >= m.ts_c - np.timedelta64(120, "m")) & (m.ts_v <= m.ts_c)]
    want = set(zip(m.event_id_c, m.event_id_v))
    assert got == want and len(got) > 0


# ------------------------------------------------------ embedding centroids

def test_label_centroids_exact(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {(r.label, r.pos): (r.n, r.sum_q6)
           for r in label_centroids(emb).collect()}

    pdf = emb.toPandas()
    want: dict = {}
    for lbl, vec in zip(pdf.label, pdf.embedding):
        for pos, val in enumerate(vec):
            n, s = want.get((lbl, pos), (0, 0))
            want[(lbl, pos)] = (n + 1, s + math.floor(float(val) * 1e6))
    assert got == want
    # every (label, pos) cell is covered
    assert len(got) == pdf.label.nunique() * len(pdf.embedding.iloc[0])


# --------------------------------------------------- polygon area/centroid

def _py_shoelace(ring, q):
    pts = [(math.floor(x * q), math.floor(y * q)) for x, y in ring]
    nxt = pts[1:] + pts[:1]
    area2 = sum(ax * by - bx * ay for (ax, ay), (bx, by) in zip(pts, nxt))
    cx = sum((ax + bx) * (ax * by - bx * ay)
             for (ax, ay), (bx, by) in zip(pts, nxt))
    cy = sum((ay + by) * (ax * by - bx * ay)
             for (ax, ay), (bx, by) in zip(pts, nxt))
    return area2, cx, cy


def test_area_centroid_matches_python_fold(spark):
    layer = PolygonLayer.from_json()
    out = {r.ring_id: r for r in
           area_centroid(rings_df(layer, spark)).collect()}

    for p in layer.polygons:
        for pi, (outer, holes) in enumerate(p.split_antimeridian()):
            rings = [(f"{p.poly_id}:{pi}:outer", outer)] + [
                (f"{p.poly_id}:{pi}:hole{hi}", h)
                for hi, h in enumerate(holes)]
            for rid, ring in rings:
                a6, _, _ = _py_shoelace(ring, 1e6)
                a3, cx3, cy3 = _py_shoelace(ring, 1e3)
                r = out[rid]
                assert (r.area2_q6, r.area2_q3, r.cx_num_q3, r.cy_num_q3) \
                    == (a6, a3, cx3, cy3)
    # the layer has at least one hole ring and one antimeridian split part
    kinds = {r.kind for r in out.values()}
    assert "hole" in kinds


def test_area_centroid_rectangle_analytic(spark):
    layer = PolygonLayer.from_json()
    out = {r.ring_id: r for r in
           area_centroid(rings_df(layer, spark)).collect()}
    r = out["P00:0:outer"]  # rect_europe_mid: 10.1..20.3 x 40.2..50.7
    area_deg2 = abs(r.area2_q6) / 2 / 1e12
    assert area_deg2 == pytest.approx((20.3 - 10.1) * (50.7 - 40.2), rel=1e-4)
    cx = r.cx_num_q3 / (3.0 * r.area2_q3) / 1e3
    cy = r.cy_num_q3 / (3.0 * r.area2_q3) / 1e3
    assert cx == pytest.approx((10.1 + 20.3) / 2, abs=2e-3)
    assert cy == pytest.approx((40.2 + 50.7) / 2, abs=2e-3)


# ----------------------------------------------------------- top-k terms

def test_top_terms_counter_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    got: dict = {}
    for r in top_terms(docs, k=3, min_len=3).collect():
        got.setdefault(r.doc_id, []).append((r.rnk, r.term, r.n))

    for row in docs.collect():
        counts = Counter(t for t in re.split("[^a-z]+", row.text.lower())
                         if len(t) >= 3)
        want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        want = [(i + 1, t, n) for i, (t, n) in enumerate(want)]
        assert sorted(got.get(row.doc_id, [])) == want, row.doc_id
