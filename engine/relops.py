"""D8 — as-of join (SURVEY.md §2.D8) and small relational helpers.

As-of = nearest-earlier right row per key: cogrouped `applyInPandas`
running `pd.merge_asof` inside each key group (SNIPPETS.md [1] pattern).
The cogroup shuffles both sides by key once; within a group pandas does a
sorted backward-inclusive merge — semantics identical to DuckDB/QuestDB
`ASOF JOIN` (verified against DuckDB in the driver contract).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType


def asof_join(left: DataFrame, right: DataFrame, *, on: str, by: str,
              suffix: str = "_r", direction: str = "backward") -> DataFrame:
    """For each left row, attach the matching right row within the same
    `by` key: `direction='backward'` (default) takes the latest right
    row with right.on <= left.on (inclusive); `'forward'` the earliest
    with right.on >= left.on; `'nearest'` (r5 cont.) the row minimizing
    |right.on - left.on| with the TIE PINNED to the backward (earlier)
    row — implemented as backward+forward merges combined under that
    explicit rule, so the contract does not ride pandas' own
    nearest-tie behavior.  Callers wanting deterministic output under
    'nearest' must feed a right side with unique `on` per key (the
    driver key dedupes marks first).

    Output schema: all left columns + right's non-key columns (nullable,
    suffixed on collision).
    """
    assert direction in ("backward", "forward", "nearest")
    # Re-alias every column on both sides to mint fresh expression ids:
    # when left and right derive from the SAME scan (self-as-of), Spark's
    # cogroup attribute dedup otherwise prunes the right side down to the
    # grouping key (observed on 4.1: right batches arrive with only `by`).
    left = left.select(*[F.col(c).alias(c) for c in left.columns])
    right = right.select(*[F.col(c).alias(c) for c in right.columns])
    lcols = left.columns
    rvalue_cols = [c for c in right.columns if c not in (on, by)]
    rename = {c: (c + suffix if c in lcols else c) for c in rvalue_cols}
    r_on = on + suffix if on in lcols else on

    fields = list(left.schema.fields)
    fields.append(StructField(r_on, right.schema[on].dataType, True))
    for c in rvalue_cols:
        f = right.schema[c]
        fields.append(StructField(rename[c], f.dataType, True))
    out_schema = StructType(fields)

    def _merge(ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        out_cols = [f.name for f in out_schema.fields]
        if ldf.empty:
            return pd.DataFrame(columns=out_cols)
        ldf = ldf.sort_values(on, kind="mergesort")
        if rdf.empty:
            merged = ldf.copy()
            merged[r_on] = pd.NaT if "time" in str(ldf[on].dtype) else None
            for c in rvalue_cols:
                merged[rename[c]] = None
        else:
            rdf = rdf.sort_values(on, kind="mergesort")
            rr = rdf.rename(columns={**rename, on: r_on})
            if direction != "nearest":
                merged = pd.merge_asof(
                    ldf, rr, left_on=on, right_on=r_on, by=by,
                    direction=direction, allow_exact_matches=True,
                )
            else:
                mb = pd.merge_asof(
                    ldf, rr, left_on=on, right_on=r_on, by=by,
                    direction="backward", allow_exact_matches=True,
                ).reset_index(drop=True)
                mf = pd.merge_asof(
                    ldf, rr, left_on=on, right_on=r_on, by=by,
                    direction="forward", allow_exact_matches=True,
                ).reset_index(drop=True)
                # subtraction is domain-agnostic (numeric or datetime;
                # NaT/NaN propagate); backward wins when both exist and
                # db <= df (the pinned tie rule), and whenever forward
                # is absent
                db = mb[on] - mb[r_on]
                dfw = mf[r_on] - mf[on]
                take_b = dfw.isna() | (~db.isna() & (db <= dfw))
                # row-wise splice (same schemas both sides; .loc keeps
                # dtypes where DataFrame.where would silently downcast)
                merged = mb.copy()
                merged.loc[~take_b, :] = mf.loc[~take_b, :]
        return merged[out_cols]

    def _wrap(_key, ldf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
        return _merge(ldf, rdf)

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(_wrap, schema=out_schema)
    )


def merge_upsert(base: DataFrame, delta: DataFrame,
                 keys: list[str]) -> DataFrame:
    """Snapshot merge (MERGE INTO upsert semantics for the bounded-diff
    ETL, north_star "bounded spatial diffing/ETL"): rows of `base` whose
    key does NOT appear in `delta`, plus every `delta` row.  One
    left-anti hash join + union — the anti join shuffles on the merge
    key exactly once and the delta side (the diff) is typically small
    enough for Catalyst/AQE to broadcast it."""
    from pyspark.sql import functions as F  # noqa: F401 (parity w/ module style)
    return delta.unionByName(base.join(delta.select(keys), keys, "left_anti"))


def sessionize(events: DataFrame, user_col: str = "user_id",
               ts_col: str = "ts", gap_s: int = 1800,
               order_tiebreak: str = "event_id") -> DataFrame:
    """BATCH sessionization — assemble per-user event sequences into
    gap-delimited sessions (the batch complement of the streaming
    session window, J4): a new session starts whenever the gap to the
    previous event of the same user exceeds `gap_s`.

    Classic lag+cumsum form, all-native: session boundary = integer
    microsecond-gap comparison, session_seq = running sum of boundary
    flags, then the per-session rollup.  The window and the rollup key
    on the SAME (user) partitioning, so Catalyst plans ONE exchange for
    the whole job (window sort + partial-combined agg reuse it); skew is
    bounded by the busiest user.

    Output: (user_id, session_seq, n_events, start_us, end_us,
    duration_us) — integer epoch-microseconds end to end (exact in
    every engine; no float time math)."""
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col),
                                             F.asc(order_tiebreak))
    gap = us - F.lag(us).over(w)
    new_sess = F.when(gap.isNull() | (gap > gap_s * 1_000_000), 1) \
        .otherwise(0)
    seq = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (events
            .withColumn("_us", us)
            .withColumn("session_seq", seq)
            .groupBy(user_col, "session_seq")
            .agg(F.count("*").alias("n_events"),
                 F.min("_us").alias("start_us"),
                 F.max("_us").alias("end_us"))
            .withColumn("duration_us", F.col("end_us") - F.col("start_us")))


def skyline_2d(df: DataFrame, x_col: str, y_col: str,
               group_col: str | None = None,
               n_parts: int | None = None) -> DataFrame:
    """2-D skyline / Pareto frontier (minimize both axes): the
    non-dominated (x, y) pairs, with `n_dup` counting coincident input
    rows (equal points never dominate each other — dominance needs one
    strict inequality — so the whole duplicate class survives as one
    row).

    Exactness: over DISTINCT sorted pairs, p is dominated iff some
    lex-(x, y) predecessor has y <= p.y (same-x predecessors have
    y < p.y by distinctness), so the frontier is `y < running exclusive
    min(y)` — a prefix scan, not a quadratic join.

    Scale shape: the base table is touched ONCE by a map-side-combined
    distinct agg; the prefix min over the distinct frame is distributed
    the `global_rank` way (engine/geo/strpack.py): range-repartition by
    (x, y), per-partition exclusive running min, plus a broadcast
    exclusive running min of per-partition minima — NO single-partition
    window over the big frame (plan-asserted in tests).  With
    `group_col` the window partitions by group instead (groups are the
    parallelism) and the range machinery is unnecessary.
    """
    agg = (df.groupBy(*( [group_col] if group_col else [] ), x_col, y_col)
           .agg(F.count("*").alias("n_dup")))
    if group_col is not None:
        w = (Window.partitionBy(group_col).orderBy(x_col, y_col)
             .rowsBetween(Window.unboundedPreceding, -1))
        return (agg.withColumn("_pm", F.min(y_col).over(w))
                .filter(F.col("_pm").isNull() | (F.col(y_col) < F.col("_pm")))
                .drop("_pm"))

    parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    d = (agg.repartitionByRange(parts, x_col, y_col)
         .withColumn("_pid", F.spark_partition_id()))
    wl = (Window.partitionBy("_pid").orderBy(x_col, y_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    d = d.withColumn("_pm", F.min(y_col).over(wl))
    pmins = d.groupBy("_pid").agg(F.min(y_col).alias("_m"))
    wg = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = (pmins.withColumn("_gm", F.min("_m").over(wg)).drop("_m"))
    keep = ((F.col("_pm").isNull() | (F.col(y_col) < F.col("_pm")))
            & (F.col("_gm").isNull() | (F.col(y_col) < F.col("_gm"))))
    return (d.join(F.broadcast(offs), "_pid")
            .filter(keep).drop("_pid", "_pm", "_gm"))


def funnel(events: DataFrame, steps, user_col: str = "user_id",
           type_col: str = "event_type", ts_col: str = "ts",
           seq_col: str = "event_id") -> DataFrame:
    """Ordered-funnel analysis: how many users complete step 1, then
    step 2 strictly after their earliest possible step-1 completion,
    and so on (the greedy earliest-match is optimal — a user reaches
    step k iff `steps` is a subsequence of their (ts, seq)-ordered type
    stream, which is exactly what the DuckDB twin checks by regex).

    -> (step_idx, step_name, n_users), one row per step.

    Scale shape: NO per-user collected state (a viral user costs
    nothing) — k passes, each a type-filtered skinny frame (filter
    pushed to the scan) + map-side-combined min(struct(ts, seq)) agg;
    step i joins step i-1's per-user watermark on the user hash key and
    the frames shrink monotonically.  Totality: (ts, seq) with seq a
    unique id, so results are partitioning/retry independent.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel: need at least one step")
    base = events.select(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_t"),
        F.struct(F.col(ts_col), F.col(seq_col)).alias("_m"))
    out = []
    prev = None
    for i, st in enumerate(steps):
        ev = base.filter(F.col("_t") == st)
        if prev is None:
            reached = ev.groupBy("_u").agg(F.min("_m").alias("_w"))
        else:
            reached = (ev.join(prev, "_u")
                       .filter(F.col("_m") > F.col("_w"))
                       .groupBy("_u").agg(F.min("_m").alias("_w")))
        prev = reached
        out.append(reached.agg(F.count("*").cast("long").alias("n_users"))
                   .select(F.lit(i + 1).cast("int").alias("step_idx"),
                           F.lit(st).alias("step_name"), "n_users"))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def global_prefix_sum(df: DataFrame, order_cols, val_col: str,
                      out: str = "running", n_parts: int | None = None,
                      inclusive: bool = True) -> DataFrame:
    """EXACT distributed prefix sum of `val_col` in `order_cols` order
    (must be a total order) WITHOUT a single-partition window: range-
    repartition, per-partition running sum, plus a broadcast exclusive
    running total of per-partition sums (the global_rank pattern,
    engine/geo/strpack.py).  Integer-exact and associative, so the
    result is independent of the sampled range boundaries."""
    cols = list(order_cols)
    parts = n_parts or df.sparkSession.sparkContext.defaultParallelism
    d = (df.repartitionByRange(parts, *cols)
         .withColumn("_pid", F.spark_partition_id()))
    wl = (Window.partitionBy("_pid").orderBy(*cols)
          .rowsBetween(Window.unboundedPreceding,
                       0 if inclusive else -1))
    d = d.withColumn("_ps", F.coalesce(F.sum(val_col).over(wl), F.lit(0)))
    psums = d.groupBy("_pid").agg(F.sum(val_col).alias("_s"))
    wg = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = psums.withColumn(
        "_off", F.coalesce(F.sum("_s").over(wg), F.lit(0))).drop("_s")
    return (d.join(F.broadcast(offs), "_pid")
            .withColumn(out, (F.col("_ps") + F.col("_off")).cast("long"))
            .drop("_pid", "_ps", "_off"))


def interval_concurrency(df: DataFrame, start_col: str, end_col: str,
                         n_parts: int | None = None) -> DataFrame:
    """Sweep-line concurrency profile over half-open intervals
    [start, end): for each distinct boundary value, how many intervals
    are active at it.  -> (boundary, delta, active), one row per
    distinct boundary.

    Scale shape: boundaries aggregate map-side (+1 at start, -1 at
    end), then ONE exact distributed prefix sum over the boundary-
    distinct frame (bounded by the value domain, not the row count) —
    the classic algorithm with no single-reducer window."""
    deltas = (df.select(F.col(start_col).alias("boundary"),
                        F.lit(1).alias("_d"))
              .unionAll(df.select(F.col(end_col).alias("boundary"),
                                  F.lit(-1).alias("_d")))
              .groupBy("boundary")
              .agg(F.sum("_d").cast("long").alias("delta")))
    return global_prefix_sum(deltas, ["boundary"], "delta", out="active",
                             n_parts=n_parts)


def ts_fill_forward(df: DataFrame, key_col: str, bucket_col: str,
                    val_col: str, max_span: int = 1 << 20) -> DataFrame:
    """Time-series gap filling with last-observation-carried-forward:
    for each key, materialize EVERY integer bucket between that key's
    first and last observed bucket, carrying `val_col` forward across
    the gaps.  -> (key, bucket, value, is_observed).

    Exact by construction (integer buckets, no interpolation — LOCF is
    the order-stable gap policy; linear interpolation would be float).
    `max_span` bounds the per-key explode (a key whose span exceeds it
    fails loudly via an in-plan assert rather than silently fanning out
    — the vectile-cap philosophy: unbounded blowup should never be an
    accident).

    Scale shape: one map-side-combined (key, bucket) agg, one tiny
    per-key span agg feeding a native sequence-explode (rows ∝ spans,
    not input), one left join back on (key, bucket), and the LOCF
    window keyed on the same hash key.
    """
    obs = (df.groupBy(key_col, bucket_col)
           .agg(F.sum(val_col).cast("long").alias("_v")))
    span = obs.groupBy(key_col).agg(
        F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1"))
    guard = F.coalesce(
        F.assert_true(F.col("_b1") - F.col("_b0") < F.lit(max_span),
                      F.lit("ts_fill_forward: key span exceeds max_span"))
        .cast("long"), F.lit(0))
    grid = span.select(
        key_col,
        F.explode(F.sequence(F.col("_b0") + guard, F.col("_b1")))
        .alias(bucket_col))
    filled = grid.join(obs, [key_col, bucket_col], "left")
    w = (Window.partitionBy(key_col).orderBy(bucket_col)
         .rowsBetween(Window.unboundedPreceding, 0))
    return filled.select(
        key_col, bucket_col,
        F.last("_v", ignorenulls=True).over(w).alias("value"),
        F.col("_v").isNotNull().cast("int").alias("is_observed"))


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts",
                     bucket_s: int = 7 * 86400) -> DataFrame:
    """F9 — cohort retention analysis: bucket time into integer
    `bucket_s` periods from the epoch, assign each user to the cohort
    of their FIRST active bucket, and count distinct users active at
    each (cohort, offset).  -> (cohort_bucket, week_offset, n_users).

    Integer end to end (epoch_us DIV converts to buckets — no date
    functions, so both engines agree exactly).

    Scale shape: ONE exchange total — the (user, bucket) activity set
    is collapsed per user with min + collect_set in a single map-side-
    combined agg (the set is bounded by the calendar span, not the
    event count), then exploded and re-aggregated map-side into the
    cohort matrix (second agg is on the tiny cohort x offset frame).
    No join, no window over the raw events."""
    # floor division in the exact integer domain (DIV matches DuckDB //
    # for the non-negative micros here)
    bucket = F.expr(
        f"unix_micros(CAST({ts_col} AS TIMESTAMP)) DIV {bucket_s * 1_000_000}")
    per_user = (events
                .select(F.col(user_col).alias("user"),
                        bucket.alias("_b"))
                .groupBy("user")
                .agg(F.min("_b").alias("cohort_bucket"),
                     F.collect_set("_b").alias("_bs")))
    act = per_user.select(
        "cohort_bucket",
        F.explode("_bs").alias("_b"))
    return (act.groupBy("cohort_bucket",
                        (F.col("_b") - F.col("cohort_bucket"))
                        .alias("week_offset"))
            .agg(F.count("*").cast("long").alias("n_users"))
            .select("cohort_bucket", "week_offset", "n_users"))


def path_transitions(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", type_col: str = "event_type",
                     tiebreak: str = "event_id") -> DataFrame:
    """F10 — first-order Markov transition counts over per-user event
    paths: order each user's history by (ts, tiebreak), pair every
    event with its successor, and count (from_type, to_type) globally,
    with the synthetic '^' start state marking path entries.
    -> (from_type, to_type, n).

    Scale shape: one window exchange on the user hash (the same
    partitioning sessionize uses), then a map-side-combined count over
    the tiny type x type frame.  Per-user state never materializes —
    the lag is the only sequence operator."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(tiebreak))
    prev = F.lag(type_col).over(w)
    return (events
            .select(F.coalesce(prev, F.lit("^")).alias("from_type"),
                    F.col(type_col).alias("to_type"))
            .groupBy("from_type", "to_type")
            .agg(F.count("*").cast("long").alias("n")))


def scd2_build(changes: DataFrame, key_col: str, ts_col: str,
               attr_col: str, tiebreak: str) -> DataFrame:
    """H7 — slowly-changing-dimension type-2 build: from a change feed
    (key, ts, attr), collapse consecutive duplicate attribute values
    and emit one versioned validity interval per run.
    -> (key, attr, valid_from_us, valid_to_us, version, is_current) —
    valid_to_us is NULL on each key's current row.

    The warehouse half of the CDC story (snapshot_incremental reads the
    feed; this shapes it into a dimension).  Integer epoch-micros; the
    run-collapse is the lag-boundary idiom sessionize uses, so the
    DuckDB twin is exact.

    Scale shape: all three windows (dup-collapse lag, version
    row_number, valid_to lead) share ONE (key) hash partitioning —
    Catalyst plans a single exchange + sort for the whole build."""
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy(F.asc(ts_col), F.asc(tiebreak))
    ch = (changes
          .withColumn("_us", us)
          .withColumn("_prev", F.lag(attr_col).over(w))
          .filter(F.col("_prev").isNull()
                  | (F.col("_prev") != F.col(attr_col))))
    w2 = Window.partitionBy(key_col).orderBy(F.asc("_us"), F.asc(tiebreak))
    return (ch.select(
        F.col(key_col),
        F.col(attr_col),
        F.col("_us").alias("valid_from_us"),
        F.lead("_us").over(w2).alias("valid_to_us"),
        F.row_number().over(w2).cast("int").alias("version"))
        .withColumn("is_current",
                    F.col("valid_to_us").isNull().cast("int")))


def interval_join(a: DataFrame, b: DataFrame, *, a_id: str, b_id: str,
                  s_col: str = "s", e_col: str = "e",
                  bucket: int = 3_600_000_000) -> DataFrame:
    """D28 — interval-overlap join on half-open integer intervals
    [s, e): every (a, b) pair with a.s < b.e AND b.s < a.e, plus the
    exact overlap length.  -> (a_id, b_id, overlap).

    Scale shape: never a theta-join.  Each interval explodes into the
    coarse `bucket`s it spans (sequence over floor(s/B)..floor((e-1)/B)
    — bounded fan-out when spans are bounded, the vectile-cap
    philosophy says pick B >= the typical span); candidates meet in a
    hash equi-join on the bucket; the responsibility rule keeps each
    pair exactly once, in the bucket containing max(a.s, b.s) — which
    both sides provably span whenever they overlap.  The refine
    predicate then discards non-overlapping same-bucket pairs.
    """
    av = a.select(F.col(a_id).alias("_aid"),
                  F.col(s_col).cast("long").alias("_as"),
                  F.col(e_col).cast("long").alias("_ae"))
    bv = b.select(F.col(b_id).alias("_bid"),
                  F.col(s_col).cast("long").alias("_bs"),
                  F.col(e_col).cast("long").alias("_be"))
    B = int(bucket)
    ax = av.withColumn(
        "_bk", F.explode(F.expr(f"sequence(_as DIV {B}, (_ae - 1) DIV {B})")))
    bx = bv.withColumn(
        "_bk", F.explode(F.expr(f"sequence(_bs DIV {B}, (_be - 1) DIV {B})")))
    j = (ax.join(bx, "_bk")
         .filter((F.col("_as") < F.col("_be"))
                 & (F.col("_bs") < F.col("_ae")))
         .filter(F.col("_bk")
                 == F.expr(f"greatest(_as, _bs) DIV {B}")))
    return j.select(F.col("_aid").alias(a_id),
                    F.col("_bid").alias(b_id),
                    (F.least("_ae", "_be")
                     - F.greatest("_as", "_bs")).alias("overlap"))


def mad_outliers(df: DataFrame, key_col: str, val_col: str,
                 tiebreak: str, k_mad: int = 3) -> DataFrame:
    """E16 — robust per-key outlier profile via the exact LOWER MEDIAN
    and median absolute deviation, entirely in the integer domain:
    med = the (n+1) DIV 2-th smallest value, MAD = the lower median of
    |x - med|, and an observation is anomalous when |x - med| >
    k_mad * MAD (the classic k=3 rule as an integer comparison — no
    1.4826 consistency scaling, which would be float; consumers apply
    it downstream if they want sigma units).
    -> (key, n, med, mad, n_anomalies).

    Selection medians (not interpolated averages) keep every statistic
    an element of the input multiset — deterministic, hash-checkable,
    and identical on any engine.

    Scale shape: two selection windows + the outlier rollup all hash
    on the key, so Catalyst reuses ONE partitioning (sorts differ per
    window; no second exchange); the med/mad frames are key-sized and
    join back on the same hash.  Skew is bounded by the busiest key."""
    w1 = Window.partitionBy(key_col).orderBy(F.asc("_v"), F.asc(tiebreak))
    base = (df.select(F.col(key_col),
                      F.col(val_col).cast("long").alias("_v"),
                      F.col(tiebreak))
            .withColumn("_rn", F.row_number().over(w1))
            .withColumn("_n", F.count("*").over(
                Window.partitionBy(key_col))))
    med = (base.filter(F.col("_rn") == F.expr("(_n + 1) DIV 2"))
           .select(F.col(key_col), F.col("_v").alias("med")))
    dev = (base.join(med, key_col)
           .withColumn("_d", F.abs(F.col("_v") - F.col("med"))))
    w2 = Window.partitionBy(key_col).orderBy(F.asc("_d"), F.asc(tiebreak))
    mad = (dev.withColumn("_rn2", F.row_number().over(w2))
           .filter(F.col("_rn2") == F.expr("(_n + 1) DIV 2"))
           .select(F.col(key_col), F.col("_d").alias("mad")))
    return (dev.join(mad, key_col)
            .groupBy(key_col)
            .agg(F.count("*").cast("long").alias("n"),
                 F.first("med").alias("med"),
                 F.first("mad").alias("mad"),
                 F.sum(F.when(F.col("_d") > k_mad * F.col("mad"), 1)
                       .otherwise(0)).cast("long").alias("n_anomalies")))


def ohlc_bars(df: DataFrame, key_col: str, us_col: str, seq_col: str,
              val_col: str, bucket_us: int) -> DataFrame:
    """OHLC candlestick bars: per (key, time bucket) the
    open / high / low / close / volume summary of an integer-valued
    series on an integer-microsecond timeline ->
    (key, bucket, open_c, high_c, low_c, close_c, n, volume_c).

    Open/close are picked by the min-struct / max-struct argmin idiom
    over (us, seq) — `seq_col` breaks timestamp ties, so the ordering
    is TOTAL and the bars are partitioning/retry/resume independent.
    All outputs are exact BIGINTs (callers pass cents, never floats).

    Scale shape: ONE map-side-combined groupBy(key, bucket) — the
    argmin rides the same aggregation buffer as high/low/volume, so
    there is no per-row window, no sort of the raw rows, and no second
    shuffle.  Bucket index = us DIV bucket_us (timestamps are
    non-negative epoch micros, so truncating and floor division agree).
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.expr(f"{us_col} DIV {bucket_us}").alias("bucket"),
        F.col(us_col).cast("long").alias("_us"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(val_col).cast("long").alias("_v"))
    return (base.groupBy("key", "bucket")
            .agg(F.min(F.struct("_us", "_seq", "_v")).getField("_v")
                 .alias("open_c"),
                 F.max("_v").alias("high_c"),
                 F.min("_v").alias("low_c"),
                 F.max(F.struct("_us", "_seq", "_v")).getField("_v")
                 .alias("close_c"),
                 F.count("*").cast("long").alias("n"),
                 F.sum("_v").cast("long").alias("volume_c")))


def ohlc_partials(df: DataFrame, key_col: str, us_col: str,
                  seq_col: str, val_col: str,
                  bucket_us: int) -> DataFrame:
    """Mergeable OHLC partials over any row subset -> (key, bucket,
    open_us, open_seq, open_c, high_c, low_c, close_us, close_seq,
    close_c, n, volume_c).

    Same single map-side-combined aggregation as `ohlc_bars`, but the
    open/close WITNESSES (their (us, seq) coordinates) stay on the
    row, which makes the partial a commutative monoid: `ohlc_merge`
    over partials of ANY disjoint split of the input equals
    `ohlc_bars` of the whole (the merge law, pytest-asserted in
    tests/test_ohlc_merge.py).  This is the shard/micro-batch path —
    each batch ships one bounded row per (key, bucket) it touched,
    never raw events.
    """
    base = df.select(
        F.col(key_col).alias("key"),
        F.expr(f"{us_col} DIV {bucket_us}").alias("bucket"),
        F.col(us_col).cast("long").alias("_us"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.col(val_col).cast("long").alias("_v"))
    o = F.min(F.struct("_us", "_seq", "_v")).alias("_o")
    c = F.max(F.struct("_us", "_seq", "_v")).alias("_c")
    return (base.groupBy("key", "bucket")
            .agg(o, F.max("_v").alias("high_c"),
                 F.min("_v").alias("low_c"), c,
                 F.count("*").cast("long").alias("n"),
                 F.sum("_v").cast("long").alias("volume_c"))
            .select("key", "bucket",
                    F.col("_o._us").alias("open_us"),
                    F.col("_o._seq").alias("open_seq"),
                    F.col("_o._v").alias("open_c"),
                    "high_c", "low_c",
                    F.col("_c._us").alias("close_us"),
                    F.col("_c._seq").alias("close_seq"),
                    F.col("_c._v").alias("close_c"),
                    "n", "volume_c"))


def ohlc_merge(parts: DataFrame) -> DataFrame:
    """Fold OHLC partials (`ohlc_partials` rows from any number of
    shards / micro-batches) into final bars with the exact `ohlc_bars`
    schema (key, bucket, open_c, high_c, low_c, close_c, n,
    volume_c).  Open/close re-run the min-struct / max-struct argmin
    over the carried witnesses — the (us, seq) order is TOTAL, so the
    merge is associative + commutative and the result is independent
    of how rows were split into partials.  ONE map-side-combined
    shuffle over the already-tiny partials frame.
    """
    return (parts.groupBy("key", "bucket")
            .agg(F.min(F.struct("open_us", "open_seq", "open_c"))
                 .getField("open_c").alias("open_c"),
                 F.max("high_c").alias("high_c"),
                 F.min("low_c").alias("low_c"),
                 F.max(F.struct("close_us", "close_seq", "close_c"))
                 .getField("close_c").alias("close_c"),
                 F.sum("n").cast("long").alias("n"),
                 F.sum("volume_c").cast("long").alias("volume_c")))


def ts_decompose(df: DataFrame, key_col: str, us_col: str,
                 val_col: str, bucket_us: int, period: int,
                 half: int) -> DataFrame:
    """Additive seasonal-trend decomposition of a bucketed integer
    series, EXACT-RATIONAL end to end (F12, r5 post-window) ->
    (key, bucket, slot, v_cents, trend_sum, sdev_num, seas_num,
    seas_den, resid_num).

    The classical moving-average decomposition v = trend + seasonal +
    residual, with every division replaced by a carried denominator:

    * bucket value v = SUM of the series' cents in the bucket (one
      map-side-combined agg);
    * trend = centered moving average over the 2*half+1 bucket RANGE
      window, reported as trend_sum with implied denominator
      W = 2*half+1 — defined ONLY where the window is FULL (all W
      buckets present; edges and gap-adjacent buckets yield NULL, the
      standard STL edge convention, which is also what keeps the
      denominator fixed);
    * scaled deviation sdev_num = v*W - trend_sum (implied /W);
    * seasonal per (key, slot = bucket mod period): seas_num =
      SUM(sdev_num) over the slot's full-window buckets with
      seas_den = n_slot * W (implied: seasonal = seas_num/seas_den);
    * residual resid_num = sdev_num * seas_den - seas_num * W
      (implied denominator W * seas_den).

    Everything is BIGINT arithmetic on the bucket frame — the raw
    series is touched once.  Plan: ONE map-side-combined (key, bucket)
    agg, ONE RANGE-window shuffle partitioned by key, ONE skinny
    (key, slot) agg broadcast-joined back.  Zero Python."""
    w_full = 2 * half + 1
    b = df.select(F.col(key_col).alias("key"),
                  F.expr(f"{us_col} DIV {bucket_us}").alias("bucket"),
                  F.col(val_col).cast("long").alias("_v"))
    s = b.groupBy("key", "bucket").agg(F.sum("_v").alias("v_cents"))
    win = (Window.partitionBy("key").orderBy("bucket")
           .rangeBetween(-half, half))
    t = (s.withColumn("_tsum", F.sum("v_cents").over(win))
         .withColumn("_tn", F.count("v_cents").over(win))
         .withColumn("trend_sum",
                     F.when(F.col("_tn") == w_full, F.col("_tsum")))
         .withColumn("sdev_num",
                     F.when(F.col("_tn") == w_full,
                            F.col("v_cents") * w_full - F.col("_tsum")))
         .withColumn("slot", F.pmod(F.col("bucket"), F.lit(period))
                     .cast("long"))
         .drop("_tsum", "_tn"))
    seas = (t.filter(F.col("sdev_num").isNotNull())
            .groupBy("key", "slot")
            .agg(F.sum("sdev_num").alias("seas_num"),
                 (F.count("*") * w_full).cast("long").alias("seas_den")))
    out = t.join(F.broadcast(seas), ["key", "slot"], "left")
    return out.select(
        "key", "bucket", "slot", "v_cents", "trend_sum", "sdev_num",
        "seas_num", "seas_den",
        (F.col("sdev_num") * F.col("seas_den")
         - F.col("seas_num") * w_full).alias("resid_num"))


def cusum_changepoint(df: DataFrame, key_col: str, ts_col: str,
                      seq_col: str, val_col: str) -> DataFrame:
    """Exact CUSUM changepoint per key (F13, r5 post-window) ->
    (key, n, total, cp_idx, cp_seq, g_max, prefix_at_cp).

    The classical single-changepoint statistic: over the time-ordered
    integer series v_1..v_n with prefix sums S_k, the maximal absolute
    deviation of the prefix path from the straight line to (n, S_n),

        G_k = | n * S_k - k * S_n |,   k = 1..n-1,

    i.e. the unnormalized CUSUM path statistic scaled by n so it stays
    an exact BIGINT.  (The variance-normalized textbook form divides
    by k(n-k); that reweighting can move the argmax, so which form you
    maximize is part of the operator CONTRACT — this one fixes the
    unnormalized form precisely because it is a pure integer function
    of the series.)  Argmax ties break to the LOWEST k; series with
    n < 2 report cp_idx 0 / g_max 0 explicitly.

    Overflow: |G| <= n * |S| — cents series of a billion rows with
    billion-cent sums overflow int64; callers at that scale pre-
    aggregate to buckets first (the ts_decompose front door).

    Scale shape: ONE shuffle — the per-key ordered window computes
    row index and prefix sum, the total rides the same partition
    window, and the argmax is one map-side-combined min(struct) fold.
    Zero Python."""
    b = df.select(F.col(key_col).alias("key"), F.col(ts_col).alias("_ts"),
                  F.col(seq_col).cast("long").alias("_seq"),
                  F.col(val_col).cast("long").alias("_v"))
    w = Window.partitionBy("key").orderBy(F.asc("_ts"), F.asc("_seq"))
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("key")
    t = (b.withColumn("_k", F.row_number().over(w).cast("long"))
         .withColumn("_sk", F.sum("_v").over(wcum))
         .withColumn("_n", F.count("*").over(wall))
         .withColumn("_s", F.sum("_v").over(wall)))
    cand = (t.filter(F.col("_k") < F.col("_n"))
            .withColumn("_g", F.abs(F.col("_n") * F.col("_sk")
                                    - F.col("_k") * F.col("_s"))))
    picked = (cand.groupBy("key")
              .agg(F.min(F.struct((-F.col("_g")).alias("neg"),
                                  F.col("_k").alias("k"),
                                  F.col("_seq").alias("seq"),
                                  F.col("_sk").alias("sk"))).alias("t"),
                   F.max("_n").alias("n"), F.max("_s").alias("total"))
              .select("key", F.col("n").cast("long").alias("n"),
                      F.col("total").cast("long").alias("total"),
                      F.col("t.k").alias("cp_idx"),
                      F.col("t.seq").alias("cp_seq"),
                      (-F.col("t.neg")).cast("long").alias("g_max"),
                      F.col("t.sk").alias("prefix_at_cp")))
    singles = (b.groupBy("key")
               .agg(F.count("*").cast("long").alias("n"),
                    F.sum("_v").cast("long").alias("total"),
                    F.min("_seq").alias("_mseq"))
               .filter(F.col("n") < 2)
               .select("key", "n", "total",
                       F.lit(0).cast("long").alias("cp_idx"),
                       F.col("_mseq").alias("cp_seq"),
                       F.lit(0).cast("long").alias("g_max"),
                       F.lit(0).cast("long").alias("prefix_at_cp")))
    return picked.unionByName(singles)


def autocorr_components(df: DataFrame, key_col: str, ts_col: str,
                        seq_col: str, val_col: str,
                        max_lag: int = 3) -> DataFrame:
    """Exact autocorrelation components per key and lag (F14, r5
    post-window) -> (key, lag, n, sum_c, sumsq_c, n_pairs, lag_dot)
    for lag = 1..max_lag over the (ts, seq)-ordered integer series.

    The operator carries the EXACT integer sufficient statistics and
    never divides: lag_dot = Sigma v_t * v_{t+lag} (n_pairs terms),
    with the per-key n / Sigma v / Sigma v^2 alongside, is everything
    the Pearson autocorrelation r_k needs — the float division is a
    trivial driver-side epilogue, while the statistics themselves stay
    associative, order-free, and hash-exact.  (The same components
    double as the lag-k autocovariance and the Durbin-Watson
    numerator.)  Overflow: |lag_dot| <= n * max|v|^2 — cents series
    pre-bucket through ts_decompose's front door at extreme scale.

    Scale shape: ONE shuffle — the per-key ordered window computes all
    max_lag leads in a single pass, and the per-(key) aggregation
    reuses the window's hash partitioning; the lag dimension is a
    bounded in-plan explode of the aggregated row, not a re-shuffle."""
    b = df.select(F.col(key_col).alias("key"), F.col(ts_col).alias("_ts"),
                  F.col(seq_col).cast("long").alias("_seq"),
                  F.col(val_col).cast("long").alias("_v"))
    w = Window.partitionBy("key").orderBy(F.asc("_ts"), F.asc("_seq"))
    t = b
    for k in range(1, max_lag + 1):
        t = t.withColumn(f"_l{k}", F.lead("_v", k).over(w))
    aggs = [F.count("*").cast("long").alias("n"),
            F.sum("_v").cast("long").alias("sum_c"),
            F.sum(F.col("_v") * F.col("_v")).cast("long")
            .alias("sumsq_c")]
    for k in range(1, max_lag + 1):
        aggs += [F.count(f"_l{k}").cast("long").alias(f"_np{k}"),
                 F.sum(F.col("_v") * F.col(f"_l{k}")).cast("long")
                 .alias(f"_d{k}")]
    g = t.groupBy("key").agg(*aggs)
    lags = F.array(*[
        F.struct(F.lit(k).cast("int").alias("lag"),
                 F.col(f"_np{k}").alias("n_pairs"),
                 F.coalesce(F.col(f"_d{k}"), F.lit(0)).alias("lag_dot"))
        for k in range(1, max_lag + 1)])
    return (g.select("key", "n", "sum_c", "sumsq_c",
                     F.explode(lags).alias("L"))
            .select("key", F.col("L.lag").alias("lag"), "n", "sum_c",
                    "sumsq_c", F.col("L.n_pairs").alias("n_pairs"),
                    F.col("L.lag_dot").alias("lag_dot")))


def seq_match(events: DataFrame, pattern: list[str],
              user_col: str = "user_id", ts_col: str = "ts",
              seq_col: str = "event_id",
              type_col: str = "event_type") -> DataFrame:
    """Contiguous-pattern counting over per-user event sequences
    (F15, r5 post-window) — MATCH_RECOGNIZE-lite, the CONTIGUOUS
    complement of funnel's subsequence semantics: per user the number
    of NON-OVERLAPPING left-to-right occurrences of `pattern` as a
    consecutive run in the (ts, seq)-ordered type stream ->
    (user, n_events, n_matches).

    Exactness: each event type maps to a single sentinel character
    (first letter — the funnel twin's encoding; callers pass patterns
    with distinct initials), the per-user string is built by ONE
    ordered collect (sort_array over (ts, seq, char) structs — a
    deterministic total order), and the count is the replace-length
    identity  (len(s) - len(replace(s, p, ''))) / len(p)  — pure
    integer string arithmetic, no regex dialect risk, identical
    semantics to left-to-right non-overlapping scanning.

    Scale shape: ONE map-side-combined groupBy(user) agg; the
    per-user string is bounded by the user's event count (the traj
    family's bounded-track contract).  Zero Python."""
    chars = [t[0] for t in pattern]
    assert len(set(chars)) == len(chars), "pattern initials must differ"
    pat = "".join(chars)
    b = events.select(
        F.col(user_col).alias("user"), F.col(ts_col).alias("_ts"),
        F.col(seq_col).cast("long").alias("_seq"),
        F.expr(f"substring({type_col}, 1, 1)").alias("_c"))
    agg = (b.groupBy("user")
           .agg(F.count("*").cast("long").alias("n_events"),
                F.array_join(
                    F.expr("transform(array_sort(collect_list("
                           "struct(_ts, _seq, _c))), s -> s._c)"), "")
                .alias("_s")))
    return agg.select(
        "user", "n_events",
        ((F.length("_s") - F.length(F.replace(F.col("_s"), F.lit(pat),
                                              F.lit(""))))
         / len(pat)).cast("long").alias("n_matches"))


def mann_kendall_components(df, key_col: str, ts_col: str, seq_col: str,
                            v_col: str):
    """F18 (r5 cont.) — exact Mann-Kendall trend components per key:
    over all time-ordered pairs i < j of the key's series (order =
    (ts, seq) lexicographic, a deterministic total order), the
    distribution-free monotonic-trend statistic

        s = #(v_j > v_i) - #(v_j < v_i)   (concordant - discordant)

    plus n, n_pairs = n(n-1)/2 and the tie-pair count — the integer
    sufficient statistics of the Mann-Kendall test; the variance
    epilogue var(S) = n(n-1)(2n+5)/18 - tie corrections and the
    normal approximation stay driver-side, the statistics never
    divide (the agg_ols doctrine).

    Scale shape: ONE per-key self-equi-join (both sides partitioned
    by key; the pair frame is Σ n_k² with per-key n bounded by
    contract — the traj_hausdorff front door: pre-bucket hot keys
    upstream) + ONE map-side-combined agg.  Zero Python; sgn is a
    CASE expression."""
    from pyspark.sql import functions as F

    b = df.select(F.col(key_col).alias("k"),
                  F.col(ts_col).alias("ts"),
                  F.col(seq_col).cast("long").alias("seq"),
                  F.col(v_col).cast("long").alias("v"))
    a1 = b.select("k", F.col("ts").alias("ts1"), F.col("seq").alias("s1"),
                  F.col("v").alias("v1"))
    a2 = b.select("k", F.col("ts").alias("ts2"), F.col("seq").alias("s2"),
                  F.col("v").alias("v2"))
    pairs = a1.join(a2, "k").filter(
        (F.col("ts1") < F.col("ts2"))
        | ((F.col("ts1") == F.col("ts2")) & (F.col("s1") < F.col("s2"))))
    sgn = (F.when(F.col("v2") > F.col("v1"), 1)
           .when(F.col("v2") < F.col("v1"), -1).otherwise(0))
    stats = (pairs.groupBy("k")
             .agg(F.count("*").cast("long").alias("n_pairs"),
                  F.sum(sgn).cast("long").alias("s"),
                  F.sum(F.when(F.col("v1") == F.col("v2"), 1)
                        .otherwise(0)).cast("long").alias("n_tie_pairs")))
    n = b.groupBy("k").agg(F.count("*").cast("long").alias("n"))
    return (n.join(stats, "k", "left")
            .select("k", "n",
                    F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
                    F.coalesce("s", F.lit(0)).alias("s"),
                    F.coalesce("n_tie_pairs", F.lit(0))
                    .alias("n_tie_pairs")))
