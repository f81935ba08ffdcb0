"""Trajectory / GPS-track statistics (SURVEY.md §2.D14, late r4).

The OSM-class domain's third geometry family beside points and polygon
layers: ordered point SEQUENCES (GPS traces, vehicle tracks).  Per
track key, over the time-ordered point stream:

  - n_points / n_steps
  - path_l1     : total travelled distance, SUM of per-step L1 norms on
                  the level-30 mercator grid ints (x wrap-aware: the
                  shorter way around the antimeridian), exact BIGINT
  - max_step_l1 : largest single step (teleport/outlier detection)
  - net_l1      : straight displacement first->last point
  - duration_us : exact integer microseconds first->last timestamp

The integer grid domain is deliberate: a float haversine path SUM over
thousands of steps is float-addition-order-dependent (non-deterministic
under repartition) and cross-libm fragile, while grid L1 in int64 is
exact, associative, and overflow-safe (step < 2^31, so ~2^32 steps per
key fit int64).  Callers needing metres multiply by the per-latitude
ground resolution downstream.

Scale shape: ONE shuffle total — the lag window partitions by track
key and the per-key aggregation reuses the same hash partitioning
(plan-asserted: a single Exchange).  Everything is native codegen
(window lag + integer arithmetic); zero Python, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from engine.geo.cells import LEVEL, merc_xy_sql

_N = 1 << LEVEL


def _wrap_dx(dx):
    """Shorter-way |dx| on the cyclic level-30 x axis."""
    a = F.abs(dx)
    return F.least(a, F.lit(_N) - a)


def traj_stats(df: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", seq_col: str = "event_id",
               lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Per-key track statistics over the time-ordered point stream.
    Ordering ties on `ts_col` break by `seq_col` (total order => the
    result is partitioning/retry independent)."""
    xi, yi = merc_xy_sql(lon, lat)
    pts = df.select(
        F.col(key_col), F.col(ts_col), F.col(seq_col),
        F.expr(xi).alias("_xi"), F.expr(yi).alias("_yi"))

    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    stepped = (
        pts.withColumn("_pxi", F.lag("_xi").over(w))
        .withColumn("_pyi", F.lag("_yi").over(w))
        .withColumn(
            "_step",
            _wrap_dx(F.col("_xi") - F.col("_pxi"))
            + F.abs(F.col("_yi") - F.col("_pyi")))
    )
    first_ts = F.min(F.struct(ts_col, seq_col, "_xi", "_yi")).alias("_f")
    last_ts = F.max(F.struct(ts_col, seq_col, "_xi", "_yi")).alias("_l")
    agg = stepped.groupBy(key_col).agg(
        F.count("*").alias("n_points"),
        F.count("_step").alias("n_steps"),
        F.coalesce(F.sum("_step"), F.lit(0)).alias("path_l1"),
        F.coalesce(F.max("_step"), F.lit(0)).alias("max_step_l1"),
        first_ts, last_ts,
    )
    return agg.select(
        key_col, "n_points", "n_steps", "path_l1", "max_step_l1",
        (_wrap_dx(F.col("_l._xi") - F.col("_f._xi"))
         + F.abs(F.col("_l._yi") - F.col("_f._yi"))).alias("net_l1"),
        (F.unix_micros(F.col(f"_l.{ts_col}"))
         - F.unix_micros(F.col(f"_f.{ts_col}"))).alias("duration_us"),
    )


HEADINGS = ("E", "NE", "N", "NW", "W", "SW", "S", "SE")


def _heading_expr(dx, dy):
    """Exact integer compass classification of a step (dx, dy): the
    dominant axis wins, exact diagonals (|dx| == |dy|) get their own
    intercardinal class — boundaries at multiples of 45 degrees are the
    ONLY angle splits expressible without libm, so the classification
    is a pure function of integer comparisons (no atan2, no ties)."""
    ax, ay = F.abs(dx), F.abs(dy)
    return (F.when(ax > ay, F.when(dx > 0, F.lit("E")).otherwise(F.lit("W")))
            .when(ay > ax, F.when(dy > 0, F.lit("N")).otherwise(F.lit("S")))
            .when((dx > 0) & (dy > 0), F.lit("NE"))
            .when((dx > 0) & (dy < 0), F.lit("SE"))
            .when((dx < 0) & (dy > 0), F.lit("NW"))
            .otherwise(F.lit("SW")))


def traj_headings(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", seq_col: str = "event_id",
                  lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Per-key step-heading distribution over the time-ordered track:
    (key, heading, n_steps), zero-length steps skipped.  The movement-
    direction descriptor beside traj_stats' distances — all-integer
    (the heading classes need no trigonometry), one shuffle (the lag
    window's partitioning feeds the count agg)."""
    xi, yi = merc_xy_sql(lon, lat)
    pts = df.select(
        F.col(key_col), F.col(ts_col), F.col(seq_col),
        F.expr(xi).alias("_xi"), F.expr(yi).alias("_yi"))
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    dx_raw = F.col("_xi") - F.lag("_xi").over(w)
    # shorter-way signed dx on the cyclic x axis
    dx = (F.when(dx_raw > _N // 2, dx_raw - _N)
          .when(dx_raw < -(_N // 2), dx_raw + _N)
          .otherwise(dx_raw))
    dy = F.lag("_yi").over(w) - F.col("_yi")  # grid y grows south
    stepped = (pts.withColumn("_dx", dx).withColumn("_dy", dy)
               .filter(F.col("_dx").isNotNull()
                       & ((F.col("_dx") != 0) | (F.col("_dy") != 0))))
    return (stepped
            .withColumn("heading", _heading_expr(F.col("_dx"), F.col("_dy")))
            .groupBy(key_col, "heading")
            .agg(F.count("*").cast("long").alias("n_steps")))


def traj_staypoints(df: DataFrame, key_col: str = "user_id",
                    ts_col: str = "ts", seq_col: str = "event_id",
                    lat: str = "lat", lon: str = "lon",
                    cell_deg: float = 5.0,
                    min_points: int = 3) -> DataFrame:
    """Stay-point detection over time-ordered tracks: a stay is a run
    of >= `min_points` CONSECUTIVE points of one key inside the same
    `cell_deg`-degree grid cell.  -> (key, cell_x, cell_y, n_points,
    start_us, end_us, dwell_us); a key that leaves a cell and returns
    produces two stays (runs, not visits — the trajectory-mining
    convention).

    Grid arithmetic is floor(coord / cell_deg) — two IEEE double ops
    (divide + floor), bit-identical across engines, so the DuckDB twin
    is exact without the libm-trig fragility the mercator kernels have
    to golden-pin.

    Scale shape: the sessionize idiom — ONE exchange; the lag window,
    the run-id running sum, and the per-run rollup all share the (key)
    hash partitioning.  Runs never materialize per-key state."""
    cx = F.floor(F.col(lon) / F.lit(cell_deg)).cast("long")
    cy = F.floor(F.col(lat) / F.lit(cell_deg)).cast("long")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    pts = (df.select(F.col(key_col), F.col(ts_col), F.col(seq_col),
                     cx.alias("_cx"), cy.alias("_cy"), us.alias("_us"))
           .withColumn("_chg",
                       F.when(F.lag("_cx").over(w).isNull()
                              | (F.lag("_cx").over(w) != F.col("_cx"))
                              | (F.lag("_cy").over(w) != F.col("_cy")),
                              1).otherwise(0))
           .withColumn("_run", F.sum("_chg").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    return (pts.groupBy(key_col, "_run",
                        F.col("_cx").alias("cell_x"),
                        F.col("_cy").alias("cell_y"))
            .agg(F.count("*").cast("long").alias("n_points"),
                 F.min("_us").alias("start_us"),
                 F.max("_us").alias("end_us"))
            .filter(F.col("n_points") >= min_points)
            .select(key_col, "cell_x", "cell_y", "n_points",
                    "start_us", "end_us",
                    (F.col("end_us") - F.col("start_us"))
                    .alias("dwell_us")))


def traj_resample(df: DataFrame, key_col: str = "user_id",
                  us_col: str = "us", x_col: str = "x", y_col: str = "y",
                  seq_col: str = "seq", grid_us: int = 3_600_000_000,
                  max_ticks: int = 1 << 20) -> DataFrame:
    """Resample each track to the fixed `grid_us` time grid by EXACT
    integer linear interpolation between the surrounding points.
    -> (key, tick_us, x, y): one row per grid tick inside the track's
    [first, last] span.  Coordinates are integer micro-units; the lerp
    runs at millisecond time resolution so dx * dt stays far inside
    int64 (|dx| < 2^29 micro-deg, dt < 2^45 ms -> product < 2^63 for
    spans up to ~1 year).

    Floor-division parity: Spark DIV truncates toward zero while
    DuckDB // floors, so the lerp first reduces the numerator by the
    MATHEMATICAL mod ((a % b + b) % b) — the remaining division is
    exact, where truncation and floor agree, making the twin
    bit-identical for negative deltas too.

    Scale shape: the sessionize/fill-forward idiom — per-key span agg
    feeds a native sequence-explode of grid markers (`max_ticks`
    guards the fan-out in-plan, the vectile-cap philosophy); markers
    union with the real points and BOTH bracketing points arrive via
    two LOCF windows (asc + desc) sharing one (key) hash
    partitioning.  One real exchange end to end."""
    pts = df.select(F.col(key_col).alias("k"),
                    F.col(us_col).cast("long").alias("t"),
                    F.col(x_col).cast("long").alias("x"),
                    F.col(y_col).cast("long").alias("y"),
                    F.lit(1).alias("real"),
                    F.col(seq_col).cast("long").alias("seq"))
    G = int(grid_us)
    span = pts.groupBy("k").agg(F.min("t").alias("_t0"),
                                F.max("t").alias("_t1"))
    guard = F.coalesce(
        F.assert_true((F.col("_t1") - F.col("_t0")) / G < max_ticks,
                      F.lit("traj_resample: span exceeds max_ticks"))
        .cast("long"), F.lit(0))
    first = (F.expr(f"((_t0 + {G} - 1) DIV {G}) * {G}") + guard)
    last = F.expr(f"(_t1 DIV {G}) * {G}")
    grid = (span.select("k", first.alias("_f"), last.alias("_l"))
            .filter(F.col("_f") <= F.col("_l"))
            .select("k", F.explode(
                F.expr(f"sequence(_f, _l, {G})")).alias("t"))
            .select("k", "t", F.lit(None).cast("long").alias("x"),
                    F.lit(None).cast("long").alias("y"),
                    F.lit(0).alias("real"),
                    F.lit(-1).cast("long").alias("seq")))
    allp = pts.unionByName(grid)
    # seq is the total-order tiebreak for same-timestamp real points
    # (grid rows carry seq = -1; `real` already separates the classes)
    wa = (Window.partitionBy("k")
          .orderBy(F.asc("t"), F.desc("real"), F.asc("seq"))
          .rowsBetween(Window.unboundedPreceding, 0))
    # real sorts before grid at equal t in BOTH windows, so a tick
    # coinciding with a point (including a track's last point) brackets
    # to that exact point instead of being dropped
    wd = (Window.partitionBy("k")
          .orderBy(F.desc("t"), F.desc("real"), F.desc("seq"))
          .rowsBetween(Window.unboundedPreceding, 0))
    lo = [F.last(F.when(F.col("real") == 1, F.col(c)), ignorenulls=True)
          .over(wa).alias(f"_{c}0") for c in ("t", "x", "y")]
    hi = [F.last(F.when(F.col("real") == 1, F.col(c)), ignorenulls=True)
          .over(wd).alias(f"_{c}1") for c in ("t", "x", "y")]
    br = allp.select("k", "t", "real", *lo, *hi).filter("real = 0")

    def lerp(c0, c1):
        # millisecond resolution; exact floor via mathematical mod
        # (the CASE guards the den=0 coincident-span branch before the
        # division is ever evaluated — safe under ANSI)
        num = f"(({c1} - {c0}) * ((t DIV 1000) - (_t0 DIV 1000)))"
        den = "((_t1 DIV 1000) - (_t0 DIV 1000))"
        fdiv = f"(({num} - ((({num} % {den}) + {den}) % {den})) DIV {den})"
        return F.expr(
            f"CASE WHEN _t1 = _t0 THEN {c0} ELSE {c0} + {fdiv} END")

    return (br.filter(F.col("_t0").isNotNull() & F.col("_t1").isNotNull())
            .select(F.col("k").alias(key_col),
                    F.col("t").alias("tick_us"),
                    lerp("_x0", "_x1").alias("x"),
                    lerp("_y0", "_y1").alias("y")))


def hausdorff_pairs(points: DataFrame, pairs: DataFrame,
                    key: str = "key", pid: str = "pid",
                    x: str = "xi", y: str = "yi") -> DataFrame:
    """Discrete Hausdorff distance between track pairs, exact squared-
    integer domain (r4 cont.) -> (key_a, key_b, h2_ab, h2_ba, h2).

    h2_ab = max_{a in A} min_{b in B} d2(a, b)  (directed, squared),
    h2    = max(h2_ab, h2_ba)                   (symmetric).

    Unlike the DP similarity family (DTW/Frechet), Hausdorff is pure
    max-of-min — fully relational, so the DuckDB twin is an exact
    independent recomputation rather than a golden pin.

    Contract: `pairs` is the BOUNDED candidate set (the join_dwithin /
    knn blocking stages produce exactly such sets); the operator is
    deliberately brute-force PER PAIR (|A|x|B| rows for a pair), the
    correct shape once candidates are bounded — never all-pairs over
    the corpus.  Plan: two hash equi-joins fan points onto pairs, the
    d2 frame is localCheckpointed ONCE and feeds both directed
    reductions (groupBy min then max, map-side combined), one final
    pair-key join.  All shuffles carry skinny integer rows."""
    pa = points.select(F.col(key).alias("key_a"),
                       F.col(pid).alias("aid"),
                       F.col(x).cast("long").alias("ax"),
                       F.col(y).cast("long").alias("ay"))
    pb = points.select(F.col(key).alias("key_b"),
                       F.col(pid).alias("bid"),
                       F.col(x).cast("long").alias("bx"),
                       F.col(y).cast("long").alias("by"))
    d2 = (pairs.join(pa, "key_a").join(pb, "key_b")
          .select("key_a", "key_b", "aid", "bid",
                  ((F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx"))
                   + (F.col("ay") - F.col("by"))
                   * (F.col("ay") - F.col("by"))).alias("d2"))
          .localCheckpoint(eager=False))
    ab = (d2.groupBy("key_a", "key_b", "aid")
          .agg(F.min("d2").alias("m"))
          .groupBy("key_a", "key_b").agg(F.max("m").alias("h2_ab")))
    ba = (d2.groupBy("key_a", "key_b", "bid")
          .agg(F.min("d2").alias("m"))
          .groupBy("key_a", "key_b").agg(F.max("m").alias("h2_ba")))
    return (ab.join(ba, ["key_a", "key_b"])
            .select("key_a", "key_b", "h2_ab", "h2_ba",
                    F.greatest("h2_ab", "h2_ba").alias("h2")))


def frechet_py(a: list[tuple[int, int]], b: list[tuple[int, int]]) -> int:
    """Sequential discrete-Frechet reference: squared coupling distance
    via the classical DP  c(i,j) = max(d2(i,j), min(c(i-1,j),
    c(i,j-1), c(i-1,j-1)))  in exact Python ints (rolling row)."""
    n, m = len(a), len(b)
    prev: list[int] = []
    for i in range(n):
        cur = [0] * m
        for j in range(m):
            d = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            if i == 0 and j == 0:
                reach = d
            elif i == 0:
                reach = max(cur[j - 1], d)
            elif j == 0:
                reach = max(prev[j], d)
            else:
                reach = max(min(prev[j], cur[j - 1], prev[j - 1]), d)
            cur[j] = reach
        prev = cur
    return prev[m - 1]


def frechet_pairs(points: DataFrame, pairs: DataFrame,
                  key: str = "key", pid: str = "pid",
                  x: str = "xi", y: str = "yi") -> DataFrame:
    """Discrete Frechet distance between track pairs, exact squared-
    integer domain (r4 cont.) -> (key_a, key_b, n_a, n_b, f2).

    The ORDER-AWARE similarity beside hausdorff_pairs: the minimal (over
    monotone couplings) maximal leash length, squared.  Frechet is a DP,
    not a relational max-of-min, so the driver oracle is an sf-pinned
    golden; the independent verification is pytest's memoized recursive
    reference plus the f2 >= h2 domination theorem.

    Contract mirrors hausdorff_pairs: `pairs` is the BOUNDED candidate
    set, and each track must fit one aggregation buffer (the traj
    family's bounded-track contract — GPS traces, not unbounded
    streams).  Plan: per-key ordered array agg (ONE map-side-combined
    shuffle over the points), two broadcast-able joins fanning arrays
    onto pairs, then an Arrow-batched DP pass whose work is
    O(|A|·|B|) per pair — bounded because candidates are."""
    import pandas as pd

    trk = (points.groupBy(key)
           .agg(F.array_sort(F.collect_list(
               F.struct(F.col(pid).cast("long").alias("pid"),
                        F.col(x).cast("long").alias("x"),
                        F.col(y).cast("long").alias("y")))).alias("trk")))
    j = (pairs
         .join(trk.select(F.col(key).alias("key_a"),
                          F.col("trk").alias("ta")), "key_a")
         .join(trk.select(F.col(key).alias("key_b"),
                          F.col("trk").alias("tb")), "key_b"))

    def _dp(batches):
        for pdf in batches:
            out = {"key_a": [], "key_b": [], "n_a": [], "n_b": [],
                   "f2": []}
            for r in pdf.itertuples(index=False):
                a = [(int(v["x"]), int(v["y"])) for v in r.ta]
                b = [(int(v["x"]), int(v["y"])) for v in r.tb]
                out["key_a"].append(r.key_a)
                out["key_b"].append(r.key_b)
                out["n_a"].append(len(a))
                out["n_b"].append(len(b))
                out["f2"].append(frechet_py(a, b))
            yield pd.DataFrame(out)

    schema = "key_a long, key_b long, n_a int, n_b int, f2 long"
    return j.mapInPandas(_dp, schema=schema)


def dtw_py(a: list[tuple[int, int]], b: list[tuple[int, int]]) -> int:
    """Sequential DTW reference: total squared alignment cost via the
    classical DP  c(i,j) = d2(i,j) + min(c(i-1,j), c(i,j-1),
    c(i-1,j-1))  in exact Python ints (rolling row)."""
    n, m = len(a), len(b)
    prev: list[int] = []
    for i in range(n):
        cur = [0] * m
        for j in range(m):
            d = (a[i][0] - b[j][0]) ** 2 + (a[i][1] - b[j][1]) ** 2
            if i == 0 and j == 0:
                c = d
            elif i == 0:
                c = cur[j - 1] + d
            elif j == 0:
                c = prev[j] + d
            else:
                c = min(prev[j], cur[j - 1], prev[j - 1]) + d
            cur[j] = c
        prev = cur
    return prev[m - 1]


def dtw_pairs(points: DataFrame, pairs: DataFrame,
              key: str = "key", pid: str = "pid",
              x: str = "xi", y: str = "yi") -> DataFrame:
    """Dynamic-time-warping distance between track pairs, exact
    squared-integer domain (r5, post-window) -> (key_a, key_b, n_a,
    n_b, dtw2).

    The SUM-cost member of the similarity triple: Hausdorff is
    unordered max-of-min, Frechet is order-aware min-of-MAX, DTW is
    order-aware min-of-SUM — the total squared alignment cost over
    monotone couplings, the classic elastic measure for tracks sampled
    at different rates.  Like Frechet it is a DP, not relational, so
    the driver oracle is an sf-pinned golden; independent verification
    is pytest's memoized recursive reference plus two theorems: (a)
    dtw2 >= f2 (the DTW-optimal path is itself a coupling, so its max
    step >= the Frechet min-max) and (b) dtw2 >= d2(first) + d2(last)
    whenever the DP has >= 2 cells (both endpoint pairs are always
    matched).

    Contract and plan mirror frechet_pairs exactly: `pairs` is the
    BOUNDED candidate set (blocking stages produce it), each track
    fits one aggregation buffer, ONE map-side-combined shuffle builds
    ordered track arrays, two joins fan arrays onto pairs, and one
    Arrow-batched DP pass does O(|A|·|B|) exact-int work per pair.
    int64 bound: |trk|·max_d2 — 2^20-grid coords give d2 <= 2^41, safe
    to ~4 M-point couplings."""
    import pandas as pd

    trk = (points.groupBy(key)
           .agg(F.array_sort(F.collect_list(
               F.struct(F.col(pid).cast("long").alias("pid"),
                        F.col(x).cast("long").alias("x"),
                        F.col(y).cast("long").alias("y")))).alias("trk")))
    j = (pairs
         .join(trk.select(F.col(key).alias("key_a"),
                          F.col("trk").alias("ta")), "key_a")
         .join(trk.select(F.col(key).alias("key_b"),
                          F.col("trk").alias("tb")), "key_b"))

    def _dp(batches):
        for pdf in batches:
            out = {"key_a": [], "key_b": [], "n_a": [], "n_b": [],
                   "dtw2": []}
            for r in pdf.itertuples(index=False):
                a = [(int(v["x"]), int(v["y"])) for v in r.ta]
                b = [(int(v["x"]), int(v["y"])) for v in r.tb]
                out["key_a"].append(r.key_a)
                out["key_b"].append(r.key_b)
                out["n_a"].append(len(a))
                out["n_b"].append(len(b))
                out["dtw2"].append(dtw_py(a, b))
            yield pd.DataFrame(out)

    schema = "key_a long, key_b long, n_a int, n_b int, dtw2 long"
    return j.mapInPandas(_dp, schema=schema)


def densify_tracks(df: DataFrame, key_col: str = "user_id",
                   ts_col: str = "ts", seq_col: str = "event_id",
                   lat: str = "lat", lon: str = "lon",
                   thresh_l1: int = 1 << 28,
                   max_pieces: int = 16) -> DataFrame:
    """D35 (r5) — great-circle track densification: every step longer
    than `thresh_l1` (level-30 grid L1 units — the EXACT integer
    length measure traj_stats rides) is split into n equal-fraction
    pieces and the n-1 INTERIOR points are emitted on the great circle
    through the step's endpoints (slerp, engine/geo/dist.py::slerp_np).
    -> (key, seq of the step's END point, k, n_pieces, lat_k, lon_k),
    coordinates rounded to 1e-7 deg (~1 cm, the geo_destination
    rounding contract).

    Control flow is ALL exact integers (wrap-aware L1 step, DIV,
    least) so the piece count — the only branch — is bit-identical on
    any engine; floats touch only the emitted coordinates, through
    numpy libm with a character-identical DuckDB twin (slerp_sql).
    `max_pieces` bounds the fan-out in-plan (the vectile-cap
    philosophy: a teleporting key cannot explode the output).

    Scale shape: ONE shuffle (the lag window's hash partitioning);
    the explode is narrow and bounded; the interpolation kernel is a
    single Arrow-batched pandas UDF over the exploded frame — no
    per-row Python, no collect."""
    from engine.geo.dist import make_slerp_udf

    xi, yi = merc_xy_sql(lon, lat)
    pts = df.select(
        F.col(key_col), F.col(ts_col), F.col(seq_col),
        F.col(lat).alias("_lat"), F.col(lon).alias("_lon"),
        F.expr(xi).alias("_xi"), F.expr(yi).alias("_yi"))
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    seg = (
        pts.withColumn("_plat", F.lag("_lat").over(w))
        .withColumn("_plon", F.lag("_lon").over(w))
        .withColumn("_pxi", F.lag("_xi").over(w))
        .withColumn("_pyi", F.lag("_yi").over(w))
        .filter(F.col("_pxi").isNotNull())
        .withColumn(
            "_step",
            _wrap_dx(F.col("_xi") - F.col("_pxi"))
            + F.abs(F.col("_yi") - F.col("_pyi")))
        .withColumn(
            "n_pieces",
            F.least(F.lit(int(max_pieces)).cast("long"),
                    F.lit(1) + F.expr(f"_step DIV {int(thresh_l1)}")))
        .filter(F.col("n_pieces") >= 2)
    )
    ex = seg.select(
        key_col, seq_col, "_plon", "_plat", "_lon", "_lat", "n_pieces",
        F.explode(F.expr("sequence(1L, n_pieces - 1L)")).alias("k"))
    udf = make_slerp_udf()
    out = ex.withColumn(
        "_p", udf(F.col("_plon"), F.col("_plat"),
                  F.col("_lon"), F.col("_lat"),
                  F.col("k").cast("double") / F.col("n_pieces").cast("double")))
    return out.select(
        key_col, seq_col, F.col("k").cast("long").alias("k"),
        F.col("n_pieces").cast("long").alias("n_pieces"),
        F.round(F.col("_p.lat2"), 7).alias("lat_k"),
        F.round(F.col("_p.lon2"), 7).alias("lon_k"))


def segment_trips(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", seq_col: str = "event_id",
                  lat: str = "lat", lon: str = "lon",
                  gap_us: int = 43_200_000_000) -> DataFrame:
    """Gap-based trip segmentation (SURVEY.md §2.D36, r5 post-window):
    split each key's time-ordered point stream into TRIPS wherever the
    step's time gap exceeds `gap_us` (exact integer microseconds; the
    first point of a key always opens trip 1), then report traj_stats'
    exact-integer descriptors PER TRIP:

      (key, trip_id, n_points, start_us, duration_us,
       path_l1, max_step_l1, net_l1)

    path/net/max are grid-L1 on the level-30 mercator ints (x
    wrap-aware) and the GAP step itself belongs to NO trip — the new
    trip's distances start at its own first point, so per-trip path
    sums never smear across the gap.  Timestamps leave as exact
    unix_micros BIGINTs (start_us), keeping the whole row
    integer-hashable.

    Scale shape: ONE shuffle total — the lag window hash-partitions by
    key, the running SUM(is_new) trip counter rides the SAME window
    partitioning, and the per-(key, trip_id) aggregation's clustering
    requirement is satisfied by the existing HashPartitioning(key)
    (grouping on a superset of the partition key adds no Exchange).
    Native codegen end to end; zero Python."""
    xi, yi = merc_xy_sql(lon, lat)
    pts = df.select(
        F.col(key_col), F.col(ts_col), F.col(seq_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.expr(xi).alias("_xi"), F.expr(yi).alias("_yi"))
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stepped = (
        pts.withColumn("_pus", F.lag("_us").over(w))
        .withColumn("_pxi", F.lag("_xi").over(w))
        .withColumn("_pyi", F.lag("_yi").over(w))
        .withColumn(
            "_new",
            (F.col("_pus").isNull()
             | ((F.col("_us") - F.col("_pus")) > F.lit(int(gap_us))))
            .cast("long"))
        .withColumn("trip_id", F.sum("_new").over(run))
        .withColumn(
            "_step",
            F.when(F.col("_new") == 0,
                   _wrap_dx(F.col("_xi") - F.col("_pxi"))
                   + F.abs(F.col("_yi") - F.col("_pyi")))))
    first_p = F.min(F.struct(ts_col, seq_col, "_us", "_xi", "_yi")).alias("_f")
    last_p = F.max(F.struct(ts_col, seq_col, "_us", "_xi", "_yi")).alias("_l")
    agg = stepped.groupBy(key_col, "trip_id").agg(
        F.count("*").alias("n_points"),
        F.coalesce(F.sum("_step"), F.lit(0)).alias("path_l1"),
        F.coalesce(F.max("_step"), F.lit(0)).alias("max_step_l1"),
        first_p, last_p)
    return agg.select(
        key_col, F.col("trip_id").cast("long").alias("trip_id"),
        F.col("n_points").cast("long").alias("n_points"),
        F.col("_f._us").alias("start_us"),
        (F.col("_l._us") - F.col("_f._us")).alias("duration_us"),
        F.col("path_l1").cast("long").alias("path_l1"),
        F.col("max_step_l1").cast("long").alias("max_step_l1"),
        (_wrap_dx(F.col("_l._xi") - F.col("_f._xi"))
         + F.abs(F.col("_l._yi") - F.col("_f._yi")))
        .cast("long").alias("net_l1"))


def od_matrix(df: DataFrame, zoom: int, key_col: str = "user_id",
              ts_col: str = "ts", seq_col: str = "event_id",
              lat: str = "lat", lon: str = "lon",
              gap_us: int = 43_200_000_000) -> DataFrame:
    """Origin-destination flow matrix (SURVEY.md §2.D37, r5
    post-window): trips segmented exactly as segment_trips (same
    gap_us, strict >), each trip contributing ONE flow from the tile
    of its first point to the tile of its last point at `zoom`
    (tx = xi >> (30 - zoom), the slippy-grid coarsening of the
    level-30 ints — pure bit shifts, no re-projection), rolled up to

      (o_tx, o_ty, d_tx, d_ty, n_trips, n_keys)

    with n_keys = exact COUNT(DISTINCT key) so a single commuter
    looping all day cannot masquerade as a popular corridor.
    Single-point trips legitimately report o = d (stationary flows on
    the diagonal — callers filter if unwanted).

    Scale shape: the window + per-trip endpoint reduction reuse ONE
    HashPartitioning(key) exchange (segment_trips' shape), then the
    OD rollup is ONE map-side-combined shuffle on the 4-int OD key —
    distinct keys per OD cell ride Spark's two-phase distinct agg.
    Native codegen; zero Python."""
    shift = LEVEL - int(zoom)
    if shift < 0 or shift >= LEVEL:
        raise ValueError(f"zoom must be in [1, {LEVEL}], got {zoom}")
    xi, yi = merc_xy_sql(lon, lat)
    pts = df.select(
        F.col(key_col), F.col(ts_col), F.col(seq_col),
        F.unix_micros(F.col(ts_col)).alias("_us"),
        F.expr(xi).alias("_xi"), F.expr(yi).alias("_yi"))
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(seq_col))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tripped = (
        pts.withColumn("_pus", F.lag("_us").over(w))
        .withColumn(
            "_new",
            (F.col("_pus").isNull()
             | ((F.col("_us") - F.col("_pus")) > F.lit(int(gap_us))))
            .cast("long"))
        .withColumn("trip_id", F.sum("_new").over(run)))
    ends = (tripped.groupBy(key_col, "trip_id").agg(
        F.min(F.struct(ts_col, seq_col, "_xi", "_yi")).alias("_f"),
        F.max(F.struct(ts_col, seq_col, "_xi", "_yi")).alias("_l")))
    return (ends.select(
                F.col(key_col),
                F.shiftrightunsigned("_f._xi", shift).alias("o_tx"),
                F.shiftrightunsigned("_f._yi", shift).alias("o_ty"),
                F.shiftrightunsigned("_l._xi", shift).alias("d_tx"),
                F.shiftrightunsigned("_l._yi", shift).alias("d_ty"))
            .groupBy("o_tx", "o_ty", "d_tx", "d_ty")
            .agg(F.count("*").cast("long").alias("n_trips"),
                 F.countDistinct(key_col).cast("long").alias("n_keys")))


def companions(df: DataFrame, zoom: int, bucket_us: int,
               key_col: str = "user_id", ts_col: str = "ts",
               lat: str = "lat", lon: str = "lon",
               min_co: int = 2,
               max_keys_per_bucket: int | None = None) -> DataFrame:
    """Co-movement companion detection (SURVEY.md §2.D38, r5
    post-window): unordered key pairs repeatedly co-present in the
    same spatio-temporal bucket — tile at `zoom` (bit-shift coarsening
    of the level-30 ints) x time bucket of `bucket_us` exact integer
    microseconds (floor division, epoch-anchored) — reported as

        (key_a, key_b, n_cobuckets)    key_a < key_b

    where n_cobuckets counts DISTINCT buckets both keys appear in
    (per-bucket presence is deduplicated first, so a chatty key
    pinging 50x in one bucket still contributes 1), filtered to
    n_cobuckets >= min_co.

    Scale shape: candidates come from ONE hash self-equi-join of the
    deduplicated presence relation on the bucket key — NEVER an
    all-pairs product over keys; the quadratic risk lives entirely in
    per-bucket key counts, so `max_keys_per_bucket` (the dedup
    family's degenerate-bucket guard) EXCLUDES buckets busier than
    the cap before the join — a crowded stadium bucket proves nothing
    about companionship and would dominate the pair frame at scale.
    Presence dedupe is one map-side-combined groupBy; the final pair
    count is one more.  Native codegen; zero Python."""
    shift = LEVEL - int(zoom)
    if shift < 0 or shift >= LEVEL:
        raise ValueError(f"zoom must be in [1, {LEVEL}], got {zoom}")
    xi, yi = merc_xy_sql(lon, lat)
    presence = (df.select(
        F.col(key_col).alias("_k"),
        F.shiftrightunsigned(F.expr(xi), shift).alias("_tx"),
        F.shiftrightunsigned(F.expr(yi), shift).alias("_ty"),
        # DIV truncates, DuckDB // floors — equal on the nonnegative
        # post-1970 fixture domain (the traj_densify precedent).
        F.expr(f"unix_micros({ts_col}) DIV {int(bucket_us)}L").alias("_tb"))
        .distinct())
    if max_keys_per_bucket is not None:
        sizes = (presence.groupBy("_tx", "_ty", "_tb")
                 .agg(F.count("*").alias("_nk"))
                 .filter(F.col("_nk") <= int(max_keys_per_bucket))
                 .drop("_nk"))
        presence = presence.join(sizes, ["_tx", "_ty", "_tb"], "left_semi")
    a = presence.select(F.col("_k").alias("key_a"), "_tx", "_ty", "_tb")
    b = presence.select(F.col("_k").alias("key_b"), "_tx", "_ty", "_tb")
    pairs = a.join(b, ["_tx", "_ty", "_tb"]).filter(
        F.col("key_a") < F.col("key_b"))
    return (pairs.groupBy("key_a", "key_b")
            .agg(F.count("*").cast("long").alias("n_cobuckets"))
            .filter(F.col("n_cobuckets") >= int(min_co)))


def locate_tracks(df: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", seq_col: str = "event_id",
                  lat: str = "lat", lon: str = "lon",
                  p: int = 1, q: int = 2) -> DataFrame:
    """D41 (r5, post-window) — the point at fraction p/q along each
    key's track (ST_LineInterpolatePoint parity, fraction measured in
    the EXACT wrap-aware level-30 grid L1 length traj_stats rides) ->
    (key, total_l1, step_seq, f_num, f_den, lat_i, lon_i).

    Control flow is ALL exact integers: the containing step is the
    unique one with cum_prev*q <= p*total < cum*q (zero-length steps
    have empty intervals and can never be picked; boundary hits go to
    the following step), and the in-step fraction is the exact
    rational (f_num, f_den) = (p*total - cum_prev*q, step*q).  Only
    the final coordinates are float: the great-circle slerp kernel
    (engine/geo/dist.py::slerp_np, numpy libm) with a character-
    identical DuckDB twin (slerp_sql) — the densify parity strategy —
    rounded to 1e-7 deg.  Degenerate tracks (single point or zero
    total length) fall back to their first point with f = 0/1.

    Scale shape: ONE shuffle (the lag window's hash partitioning,
    reused by the running-sum and total windows); the picked frame is
    one row per key; the slerp kernel is one Arrow-batched pandas UDF
    over it.  No collect, no per-row Python."""
    assert 0 <= p < q
    from engine.geo.dist import make_slerp_udf

    xi, yi = merc_xy_sql(lon, lat)
    pts = df.select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("_ts"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(lat).alias("_lat"), F.col(lon).alias("_lon"),
        F.expr(xi).alias("_xi"), F.expr(yi).alias("_yi"))
    w = Window.partitionBy("key").orderBy(F.asc("_ts"), F.asc("_seq"))
    seg = (pts
           .withColumn("_plat", F.lag("_lat").over(w))
           .withColumn("_plon", F.lag("_lon").over(w))
           .withColumn("_pxi", F.lag("_xi").over(w))
           .withColumn("_pyi", F.lag("_yi").over(w)))
    steps = (seg.filter(F.col("_pxi").isNotNull())
             .withColumn("_step",
                         _wrap_dx(F.col("_xi") - F.col("_pxi"))
                         + F.abs(F.col("_yi") - F.col("_pyi"))))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wtot = Window.partitionBy("key")
    st = (steps.withColumn("_cum", F.sum("_step").over(wcum))
          .withColumn("_tot", F.sum("_step").over(wtot)))
    target = F.lit(int(p)) * F.col("_tot")
    prev_q = (F.col("_cum") - F.col("_step")) * q
    sel = (st.filter((prev_q <= target) & (target < F.col("_cum") * q))
           .withColumn("f_num", (target - prev_q).cast("long"))
           .withColumn("f_den", (F.col("_step") * q).cast("long")))
    slerp = make_slerp_udf()
    f = F.col("f_num").cast("double") / F.col("f_den")
    picked = (sel.withColumn("_ip", slerp(F.col("_plon"), F.col("_plat"),
                                          F.col("_lon"), F.col("_lat"),
                                          f))
              .select("key", F.col("_tot").cast("long").alias("total_l1"),
                      F.col("_seq").alias("step_seq"), "f_num", "f_den",
                      F.round(F.col("_ip.lat2"), 7).alias("lat_i"),
                      F.round(F.col("_ip.lon2"), 7).alias("lon_i")))
    first = (pts.groupBy("key")
             .agg(F.min(F.struct("_ts", "_seq", "_lat", "_lon"))
                  .alias("_f")))
    fb = (first.join(picked.select("key"), "key", "left_anti")
          .select("key", F.lit(0).cast("long").alias("total_l1"),
                  F.col("_f._seq").alias("step_seq"),
                  F.lit(0).cast("long").alias("f_num"),
                  F.lit(1).cast("long").alias("f_den"),
                  F.round(F.col("_f._lat"), 7).alias("lat_i"),
                  F.round(F.col("_f._lon"), 7).alias("lon_i")))
    return picked.unionByName(fb)
