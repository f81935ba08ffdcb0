"""Local two-raster map algebra (engine/geo/raster.py::raster_algebra)
and exact-rational bilinear sampling (sample_bilinear): brute dense
oracles with absent cells as TRUE ZEROS, the corner-recovery and
linear-field-exactness theorems for bilinear, hole semantics
(n_corners), presence-flag filters, repartition invariance.  DuckDB
value-hash parity for the driver keys runs in test_entry_contract's
sweep."""

from __future__ import annotations

import random

from engine.geo.raster import raster_algebra, sample_bilinear

A_ROWS = [(0, 0, 5), (1, 0, 3), (2, 2, 7), (4, 1, 2), (9, 9, 1)]
B_ROWS = [(0, 0, 2), (2, 2, 7), (3, 3, 4), (4, 1, 6)]


def _raster(spark, rows):
    return spark.createDataFrame(rows, "gx long, gy long, w long")


def _alg_brute(a_rows, b_rows):
    a = {(x, y): w for x, y, w in a_rows}
    b = {(x, y): w for x, y, w in b_rows}
    out = {}
    for c in set(a) | set(b):
        wa, wb = a.get(c, 0), b.get(c, 0)
        out[c] = (wa, wb, wa + wb, wa - wb, wa * wb, min(wa, wb),
                  max(wa, wb), int(c in a), int(c in b))
    return out


def _alg_got(spark, a_rows, b_rows):
    df = raster_algebra(_raster(spark, a_rows), _raster(spark, b_rows))
    return {(r.gx, r.gy): (r.wa, r.wb, r.w_sum, r.w_diff, r.w_prod,
                           r.w_min, r.w_max, r.in_a, r.in_b)
            for r in df.collect()}


def test_algebra_brute_parity(spark):
    assert _alg_got(spark, A_ROWS, B_ROWS) == _alg_brute(A_ROWS, B_ROWS)


def test_algebra_random_vs_brute(spark):
    rng = random.Random(20260820)
    a = [(x, y, rng.randint(1, 9)) for x in range(8) for y in range(8)
         if rng.random() < 0.4]
    b = [(x, y, rng.randint(1, 9)) for x in range(8) for y in range(8)
         if rng.random() < 0.4]
    assert _alg_got(spark, a, b) == _alg_brute(a, b)


def test_algebra_presence_flags_recover_set_ops(spark):
    got = _alg_got(spark, A_ROWS, B_ROWS)
    inter = {c for c, v in got.items() if v[7] and v[8]}
    assert inter == {(0, 0), (2, 2), (4, 1)}
    only_a = {c for c, v in got.items() if v[7] and not v[8]}
    assert only_a == {(1, 0), (9, 9)}


def test_algebra_self_is_doubling(spark):
    got = _alg_got(spark, A_ROWS, A_ROWS)
    for (x, y, w) in A_ROWS:
        assert got[(x, y)] == (w, w, 2 * w, 0, w * w, w, w, 1, 1)


# ---------------------------------------------------------------- bilinear

S = 16


def _queries(spark, rows):
    return spark.createDataFrame(rows, "qid long, qx_q long, qy_q long")


def _bil_brute(pix_rows, q_rows, s=S):
    z = {(x, y): w for x, y, w in pix_rows}
    out = {}
    for qid, qx, qy in q_rows:
        cx, cy, fx, fy = qx // s, qy // s, qx % s, qy % s
        num, nc = 0, 0
        for i in (0, 1):
            for j in (0, 1):
                wt = ((s - fx) if i == 0 else fx) \
                    * ((s - fy) if j == 0 else fy)
                if (cx + i, cy + j) in z:
                    nc += 1
                    num += wt * z[(cx + i, cy + j)]
        out[qid] = (qx, qy, num, s * s, nc)
    return out


def _bil_got(spark, pix_rows, q_rows, s=S):
    df = sample_bilinear(_raster(spark, pix_rows),
                         _queries(spark, q_rows), scale=s)
    return {r.qid: (r.qx_q, r.qy_q, r.val_num, r.val_den, r.n_corners)
            for r in df.collect()}


def test_bilinear_random_vs_brute(spark):
    rng = random.Random(7)
    pix = [(x, y, rng.randint(1, 99)) for x in range(10) for y in range(10)
           if rng.random() < 0.5]
    qs = [(i, rng.randrange(0, 10 * S), rng.randrange(0, 10 * S))
          for i in range(200)]
    assert _bil_got(spark, pix, qs) == _bil_brute(pix, qs)


def test_bilinear_corner_recovery(spark):
    # fx = fy = 0 recovers the cell value exactly: num = z * s^2.
    pix = [(3, 4, 11), (5, 5, 7)]
    qs = [(1, 3 * S, 4 * S), (2, 5 * S, 5 * S)]
    got = _bil_got(spark, pix, qs)
    assert got[1][2] == 11 * S * S and got[2][2] == 7 * S * S


def test_bilinear_linear_field_exact(spark):
    # bilinear interpolation reproduces a linear field exactly:
    # z = 3x + 2y + 5 on a full grid => num = s*(3*qx + 2*qy) + 5*s^2.
    pix = [(x, y, 3 * x + 2 * y + 5) for x in range(8) for y in range(8)]
    qs = [(i, qx, qy) for i, (qx, qy) in enumerate(
        [(0, 0), (17, 33), (7 * S - 1, 7 * S - 1), (50, 100)])]
    got = _bil_got(spark, pix, qs)
    for qid, qx, qy in qs:
        assert got[qid][2] == S * (3 * qx + 2 * qy) + 5 * S * S


def test_bilinear_hole_semantics(spark):
    # sampling far from any pixel: exact 0 with n_corners = 0 — and a
    # query is PRESERVED (left join), not dropped.
    got = _bil_got(spark, [(0, 0, 9)], [(42, 100 * S, 100 * S)])
    assert got[42] == (100 * S, 100 * S, 0, S * S, 0)


def test_bilinear_repartition_invariance(spark):
    rng = random.Random(99)
    pix = [(x, y, rng.randint(1, 9)) for x in range(6) for y in range(6)
           if rng.random() < 0.6]
    qs = [(i, rng.randrange(0, 6 * S), rng.randrange(0, 6 * S))
          for i in range(100)]
    df_p = _raster(spark, pix).repartition(5)
    df_q = _queries(spark, qs).repartition(3)
    got = {r.qid: (r.qx_q, r.qy_q, r.val_num, r.val_den, r.n_corners)
           for r in sample_bilinear(df_p, df_q, scale=S).collect()}
    assert got == _bil_brute(pix, qs)
