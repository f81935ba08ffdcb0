"""L9 (r5 cont.) — declarative data-quality expectations.

dq_report (L5') hard-codes one table's checks; `expect` is the
GENERIC rule engine a lakehouse pipeline actually configures — rules
are DATA (name -> predicate), plus the two table-level rule kinds a
row predicate cannot express (key uniqueness, referential
containment).  The contract pins the null semantics: a row violates a
predicate rule unless the predicate evaluates to TRUE (NULL is a
violation — the Great-Expectations convention), via
NOT coalesce(pred, FALSE).

Scale shape: ALL predicate rules ride ONE map-side-combined pass over
the table (one sum per rule — adding a rule adds a column, not a
scan); uniqueness is one groupBy on the key; referential containment
is one anti-join probe against the (broadcast) dimension.  The output
is the tiny (rule, n_checked, n_violations, passed) relation — the
WAP audit gate consumes `min(passed)`.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def expect(df: DataFrame, row_rules: Mapping[str, str],
           unique_key: Sequence[str] = (),
           fk: tuple[Sequence[str], DataFrame, Sequence[str]] | None = None,
           broadcast_dim: bool = True) -> DataFrame:
    """-> (rule, n_checked, n_violations, passed) with one row per
    rule; `passed` = (n_violations == 0) as int."""
    aggs = [F.count("*").cast("long").alias("_n")]
    for name, pred in row_rules.items():
        aggs.append(
            F.sum((~F.coalesce(F.expr(pred), F.lit(False))).cast("long"))
            .alias(name))
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{n}', {n}" for n in row_rules)
    out = one.selectExpr(
        f"stack({len(row_rules)}, {stack_args}) AS (rule, n_violations)",
        "_n AS n_checked")
    parts = [out.select("rule", "n_checked", "n_violations")]
    if unique_key:
        dup = (df.groupBy(*unique_key).agg(F.count("*").alias("_c"))
               .filter("_c > 1")
               .agg(F.coalesce(F.sum("_c"), F.lit(0)).cast("long")
                    .alias("n_violations")))
        n = df.agg(F.count("*").cast("long").alias("n_checked"))
        parts.append(
            n.crossJoin(dup).select(
                F.lit("unique:" + ",".join(unique_key)).alias("rule"),
                "n_checked", "n_violations"))
    if fk is not None:
        cols, dim, dim_cols = fk
        probe = df.select(*[F.col(c).alias(d)
                            for c, d in zip(cols, dim_cols)])
        dimk = dim.select(*dim_cols).distinct()
        if broadcast_dim:
            dimk = F.broadcast(dimk)
        orphans = (probe.join(dimk, list(dim_cols), "anti")
                   .agg(F.count("*").cast("long").alias("n_violations")))
        n = df.agg(F.count("*").cast("long").alias("n_checked"))
        parts.append(
            n.crossJoin(orphans).select(
                F.lit("fk:" + ",".join(cols)).alias("rule"),
                "n_checked", "n_violations"))
    res = parts[0]
    for p in parts[1:]:
        res = res.unionByName(p)
    return res.withColumn(
        "passed", (F.col("n_violations") == 0).cast("int"))
