"""Edit-distance (Levenshtein) similarity self-join — PassJoin-style
segment blocking with an exact completeness guarantee (r4 cont.).

Problem: all pairs (a, b) with lev(s_a, s_b) <= k, without the n^2
cross join.  Scheme (Li, Deng, Feng — "PassJoin", PVLDB 2011; public
algorithm, re-derived here):

  *Partition lemma.*  Split every string s into k+1 contiguous
  segments.  If lev(s, t) <= k, then in any optimal alignment at most k
  segments contain an edit, so at least one segment aligns edit-free:
  it occurs in t EXACTLY, at a position whose offset from its position
  in s is at most k (the alignment shift at any boundary is bounded by
  the number of edits before it).

So candidate generation is two exploded projections + one equi-join:

  index side:  each string of length L emits its k+1 segments as rows
               (L, i, seg_text);
  probe side:  each string t of length M emits, for every target
               length L in [M-k, M+k] and segment slot i, the
               substrings of t of the slot's length at positions within
               +-k of the slot's start — a CONSTANT (2k+1)(k+1)(2k+1)
               fan-out per row, independent of n.

Join on (L, i, substring) equality, canonicalize the unordered pair,
`distinct`, then verify with the native JVM `levenshtein` — exact DP,
candidates only, no Python anywhere.  By the lemma the candidate set is
a superset of the true result: recall is 1 by theorem, precision is
restored by the verify.  Strings shorter than k+1 (some segment empty,
the lemma can land on an empty segment) are routed through a broadcast
short-string pool instead — at scale that pool is a constant-size
side input (strings of length <= k).

Scale shape: the only big-side shuffle is the (L, i, seg) equi-join on
short substring keys; fan-out is a constant; verification is native
codegen.  Skewed segments (e.g. a viral prefix) inflate one bucket —
exact duplicates should be exact-deduped upstream (engine/text/dedup),
and `segment_bucket_stats` makes residual skew observable, mirroring
oversized_bucket_stats for LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _seg_start(L, i, n):
    """Start (0-based) of segment i of a length-L string split into n
    contiguous segments, first (L % n) segments one char longer."""
    return i * (L / n).cast("long") + F.least(i, L % n)


def _seg_len(L, i, n):
    return (L / n).cast("long") + F.when(i < L % n, F.lit(1)).otherwise(F.lit(0))


def editdist_join(df: DataFrame, *, id_col: str = "doc_id",
                  s_col: str = "s", k: int = 2) -> DataFrame:
    """All unordered pairs with lev <= k as (id_a, id_b, dist), exact.

    `df` must carry one non-null string per row; pre-dedup exact
    duplicates upstream if the corpus may contain viral identical
    strings (they are still returned correctly here, just at
    bucket-squared candidate cost).
    """
    n = k + 1
    base = df.select(F.col(id_col).cast("long").alias("id"),
                     F.col(s_col).alias("s"),
                     F.length(s_col).cast("long").alias("L"))

    # --- index side: the k+1 segments of every long-enough string
    i_col = F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i")
    idx = (base.where(F.col("L") >= n)
           .select("id", "s", "L", i_col)
           .select("id", "s", "L", "i",
                   _seg_start(F.col("L"), F.col("i"), n).alias("st"),
                   _seg_len(F.col("L"), F.col("i"), n).alias("ln"))
           .select("id", "s", "L", "i",
                   F.expr("substring(s, st + 1, ln)").alias("seg")))

    # --- probe side: candidate substrings at every (target length,
    # slot, +-k shift); empty shift windows yield an empty array and
    # the explode drops the row.
    prb = (base
           .select("id", "s", F.col("L").alias("M"),
                   F.explode(F.sequence(
                       F.greatest(F.col("L") - k, F.lit(n)),
                       F.col("L") + k)).alias("L"))
           .select("id", "s", "M", "L",
                   F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"))
           .select("id", "s", "M", "L", "i",
                   _seg_start(F.col("L"), F.col("i"), n).alias("st"),
                   _seg_len(F.col("L"), F.col("i"), n).alias("ln"))
           .withColumn("lo", F.greatest(F.col("st") - k, F.lit(0)))
           .withColumn("hi", F.least(F.col("st") + k, F.col("M") - F.col("ln")))
           .where(F.col("lo") <= F.col("hi"))
           .select("id", "s", "L", "i", "ln",
                   F.explode(F.sequence("lo", "hi")).alias("p"))
           .select(F.col("id").alias("pid"), F.col("s").alias("ps"),
                   "L", "i", F.expr("substring(s, p + 1, ln)").alias("seg"))
           .dropDuplicates(["pid", "L", "i", "seg"]))

    cand = (idx.join(prb, ["L", "i", "seg"])
            .where(F.col("id") != F.col("pid"))
            .select(F.least("id", "pid").alias("id_a"),
                    F.greatest("id", "pid").alias("id_b"),
                    F.when(F.col("id") < F.col("pid"), F.col("s"))
                     .otherwise(F.col("ps")).alias("s_a"),
                    F.when(F.col("id") < F.col("pid"), F.col("ps"))
                     .otherwise(F.col("s")).alias("s_b"))
            .dropDuplicates(["id_a", "id_b"]))

    # --- short-string pool (L < k+1): the lemma can land on an empty
    # segment, so these bypass blocking.  The pool is broadcast — at
    # most |alphabet|^k distinct strings matter, a constant side input.
    short = base.where(F.col("L") < n).select(
        F.col("id").alias("sid"), F.col("s").alias("ss"),
        F.col("L").alias("SL"))
    short_cand = (base.join(F.broadcast(short),
                            (F.col("id") != F.col("sid"))
                            & (F.col("L") - F.col("SL") <= k))
                  .select(F.least("id", "sid").alias("id_a"),
                          F.greatest("id", "sid").alias("id_b"),
                          F.when(F.col("id") < F.col("sid"), F.col("s"))
                           .otherwise(F.col("ss")).alias("s_a"),
                          F.when(F.col("id") < F.col("sid"), F.col("ss"))
                           .otherwise(F.col("s")).alias("s_b"))
                  .dropDuplicates(["id_a", "id_b"]))

    allc = cand.unionByName(short_cand).dropDuplicates(["id_a", "id_b"])
    return (allc
            .withColumn("dist", F.levenshtein("s_a", "s_b").cast("long"))
            .where(F.col("dist") <= k)
            .select("id_a", "id_b", "dist"))


def segment_bucket_stats(df: DataFrame, *, id_col: str = "doc_id",
                         s_col: str = "s", k: int = 2,
                         threshold: int = 1024) -> DataFrame:
    """Audit: segment buckets whose size exceeds `threshold` — each
    contributes O(size * (2k+1)^2) candidates.  Mirrors
    dedup.oversized_bucket_stats: run it before editdist_join on a new
    corpus to see whether exact-dedup or a hotter-key plan is needed."""
    n = k + 1
    base = df.select(F.col(id_col).alias("id"), F.col(s_col).alias("s"),
                     F.length(s_col).cast("long").alias("L"))
    segs = (base.where(F.col("L") >= n)
            .select("id", "s", "L",
                    F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"))
            .select("L", "i",
                    F.expr(f"substring(s, cast(i * (L div {n}) + "
                           f"least(i, L % {n}) as int) + 1, "
                           f"cast(L div {n} as int) + "
                           f"if(i < L % {n}, 1, 0))").alias("seg")))
    return (segs.groupBy("L", "i", "seg").count()
            .where(F.col("count") > threshold)
            .orderBy(F.desc("count"), "L", "i", "seg"))
