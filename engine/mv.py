"""H8 — incremental materialized-view maintenance over icelite CDC.

The missing third leg of the snapshot story: `snapshot_incremental`
reads the append-only changelog, `scd2_build` shapes it into history —
this module keeps a grouped-aggregate VIEW current without ever
re-scanning the fact table.  Each refresh:

  1. reads the mv's own latest commit props to find the last fact
     snapshot it folded in (`mv_fact_sid` — the cursor RIDES ON the mv
     table, so resume-after-kill is free, the pipeline.py property);
  2. scans ONLY the fact rows appended since (metadata-only file
     planning via scan_incremental — bytes read scale with the delta,
     never the table);
  3. partial-aggregates the delta and MERGES it into the current view
     by re-aggregating (view ++ delta-partial) on the group keys —
     sound because every supported measure is a commutative monoid
     (count/sum add, min/max lattice-join);
  4. commit_replace's the merged view, stamping the new cursor.

At 100 TB the fact scan is the whole game: a view over a 10^12-row
table refreshes in O(delta + |view|), and |view| is the group-key
cardinality, not the row count.  Exactness: integer measures only
(cents domain for money) — float SUM would drift from the
full-recompute oracle under re-aggregation order.

Measures spec: {out_col: (kind, src_sql)} with kind in
{"count", "sum", "min", "max"}; src_sql ignored for count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.icelite import IceliteTable

_PARTIAL = {
    "count": lambda src: F.count("*").cast("long"),
    "sum": lambda src: F.sum(F.expr(src)).cast("long"),
    "min": lambda src: F.min(F.expr(src)).cast("long"),
    "max": lambda src: F.max(F.expr(src)).cast("long"),
}
_MERGE = {
    "count": F.sum,
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
}


def _cursor(mv: IceliteTable) -> int | None:
    """Last fact snapshot folded into the view, from the mv table's
    own latest commit props (None = view not initialized)."""
    if not mv.exists():
        return None
    snaps = mv.snapshots()
    if not snaps:
        return None
    cur = mv.current_snapshot_id()
    rec = next(s for s in snaps if s["sid"] == cur)
    v = (rec.get("props") or {}).get("mv_fact_sid")
    return int(v) if v is not None else None


def mv_refresh(spark: SparkSession, fact: IceliteTable, mv: IceliteTable,
               keys: list[str], measures: dict[str, tuple[str, str | None]],
               ) -> int:
    """Fold every fact commit since the view's cursor into the view.
    Returns the new mv snapshot id.  Idempotent: refreshing with no new
    fact commits rewrites an identical view (same cursor)."""
    last = _cursor(mv)
    cur = fact.current_snapshot_id()
    if cur is None:
        raise FileNotFoundError(f"mv_refresh: fact table empty: {fact.root}")
    if last is None:
        delta = fact.scan(spark)
    elif last == cur:
        delta = None
    else:
        delta = (fact.scan_incremental(spark, last, cur)
                 .drop("commit_seq", "snapshot_id"))

    def _partial(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(*[
            _PARTIAL[kind](src).alias(name)
            for name, (kind, src) in measures.items()])

    if last is None:
        merged = _partial(delta)
    else:
        view = mv.scan(spark)
        if delta is not None:
            view = view.unionByName(_partial(delta))
        merged = view.groupBy(*keys).agg(*[
            _MERGE[kind](name).cast("long").alias(name)
            for name, (kind, _src) in measures.items()])
    return mv.commit_replace(merged, stage=f"mv@{cur}",
                             props={"mv_fact_sid": str(cur)})
