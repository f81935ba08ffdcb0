"""Count-min sketch in the exact integer domain (r4 cont.) — the
mergeable frequency sketch beside the built-in HLL (agg_approx_cd) and
the exact heavy-hitter top-K (engine/geo/skew.py).

The sketch is DETERMINISTIC: row i of the depth-d matrix uses the
universal hash h_i(x) = ((a_i * x + b_i) mod p) mod w with p = 2^31-1
and FIXED odd multipliers — pure int64 arithmetic (a_i < 2^31,
x hashed through one splitmix-style fold first so raw ids spread), so
the whole matrix and every estimate is a pure function of the input
multiset and identical on any engine — which is what makes a driver
hash-oracle possible for an *approximate* structure: the
approximation is in the GUARANTEE (est >= truth, off by at most
eps * N with probability 1 - delta), not in any run-to-run wobble.

Scale shape: the matrix build is ONE map-side-combined groupBy over
d * n rows (the per-row explode is a literal array of d struct
expressions, no Python); the matrix itself is d*w rows — broadcast-
sized by construction — so estimates join against it broadcast.
Sketches of disjoint partitions merge by cell-wise addition (the
groupBy IS the merge), the property that makes CMS the streaming /
pre-aggregation structure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

P = 2147483647  # 2^31 - 1
# fixed (a, b) rows — odd multipliers, arbitrary but committed
ROWS = ((1103515245, 12345), (69069, 362437), (1664525, 1013904223))
FOLD = 2654435761  # integer spread of raw ids before the affine rows


def _cell(x, a, b, width):
    folded = (x * FOLD) % P
    return ((folded * a + b) % P) % width


def cms_build(df: DataFrame, key_col: str, width: int = 1024) -> DataFrame:
    """-> (row, cell, n): the depth-3 count-min matrix of key_col's
    frequency multiset.  One exchange (map-side combined)."""
    cells = F.array(*[
        F.struct(F.lit(i).alias("row"),
                 _cell(F.col(key_col), a, b, width).cast("long")
                 .alias("cell"))
        for i, (a, b) in enumerate(ROWS)])
    return (df.select(F.explode(cells).alias("_c"))
            .groupBy(F.col("_c.row").alias("row"),
                     F.col("_c.cell").alias("cell"))
            .agg(F.count("*").cast("long").alias("n")))


def cms_estimate(cms: DataFrame, probes: DataFrame, key_col: str,
                 width: int = 1024) -> DataFrame:
    """probes (key_col) x cms -> (key, cms_est): min over the d rows.
    The matrix side is d*w rows — broadcast it."""
    pc = probes.select(
        F.col(key_col),
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row"),
                     _cell(F.col(key_col), a, b, width).cast("long")
                     .alias("cell"))
            for i, (a, b) in enumerate(ROWS)])).alias("_c"))
    j = (pc.select(key_col, F.col("_c.row").alias("row"),
                   F.col("_c.cell").alias("cell"))
         .join(F.broadcast(cms), ["row", "cell"], "left")
         .withColumn("n", F.coalesce("n", F.lit(0))))
    return (j.groupBy(key_col)
            .agg(F.min("n").cast("long").alias("cms_est")))


# ------------------------------------------------------------- HyperLogLog

# Deterministic HLL beside the CMS: p=9 -> m=512 buckets over the
# splitmix64 avalanche (engine/text/dedup._mix64 — the engine's
# standard vectorized hash; an Arrow-batched kernel on the Spark side,
# the HUGEINT split-multiply twin `_mix64_sql` on the DuckDB side).
# The register value rho is the 1-based first-set-bit position inside
# a FIXED 22-bit window of the hash, so every register — and the
# integer estimate — is a pure function of the input SET (max is
# order-free and duplicate-blind): identical on any engine, which is
# what makes a driver hash-oracle possible for an approximate
# structure.  The approximation lives in the guarantee
# (stderr ~ 1.04/sqrt(m) ~ 4.6%, pytest), never run-to-run wobble.
#
# The small-range linear-counting correction is deliberately NOT on
# the driver surface (it needs ln): the committed output is the raw
# integer estimate plus (m, used_buckets), from which a consumer
# applies LC when used < ~0.7*m (pytest proves LC lands within 5% on
# a small-range fixture).  alpha is the committed fixed-point rational
# 7213/10000; est = (ALPHA_NUM*m^2*2^RMAX) DIV (ALPHA_DEN*S) is exact
# int64 (numerator < 2^54).
#
# An earlier draft hashed with the CMS's mod-(2^31-1) LCG rows —
# measured est errors of 27-130% at n=2e2..1e6: lattice structure in
# the high bits wrecks the geometric rank statistic even though the
# same hash is fine for CMS bucketing.  Rank-based sketches need
# avalanche hashes; committed here as a lesson, enforced by the
# accuracy pytest.

HLL_P = 9
HLL_M = 1 << HLL_P          # 512 buckets = hash bits 0..8
HLL_W = 22                  # rank window = hash bits 9..30
HLL_RMAX = HLL_W + 1        # rho for an all-clear window
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 7213, 10000


def hll_rho_sql(v: str) -> str:
    """1-based first-set-bit position of expression `v` within the
    fixed HLL_W-bit window, as a portable CASE ladder (no log2 floats;
    the SAME text runs on Spark and DuckDB)."""
    cases = " ".join(
        f"WHEN {v} >= {1 << (HLL_W - k)} THEN {k}"
        for k in range(1, HLL_W + 1))
    return f"(CASE {cases} ELSE {HLL_RMAX} END)"


def _mix64_udf():
    from engine.text.dedup import _mix64

    @F.pandas_udf("long")
    def mix(s: pd.Series) -> pd.Series:
        h = _mix64(s.to_numpy(dtype="int64").view(np.uint64).copy())
        return pd.Series(h.view(np.int64))
    return mix


def hll_build(df: DataFrame, key_col: str) -> DataFrame:
    """-> (bucket, rho): the register table (only non-empty buckets
    appear).  One Arrow-batched hash projection + one map-side-combined
    exchange; registers of disjoint partitions merge by cell-wise MAX
    (the groupBy IS the merge), the property stream_hll leans on.
    Signed int64 carries the uint64 hash bits: bucket/window extraction
    uses & / shiftrightunsigned, which see raw bits, never the sign."""
    mix = _mix64_udf()
    h = df.select(mix(F.col(key_col).cast("long")).alias("_h"))
    v = f"(shiftrightunsigned(_h, {HLL_P}) & {(1 << HLL_W) - 1})"
    return (h.selectExpr(
        f"CAST((_h & {HLL_M - 1}) AS BIGINT) AS bucket",
        f"CAST({hll_rho_sql(v)} AS BIGINT) AS rho")
        .groupBy("bucket").agg(F.max("rho").alias("rho")))


def hll_estimate(registers: DataFrame) -> DataFrame:
    """registers (bucket, rho) -> one row (m, used_buckets, s_scaled,
    hll_est): the raw HLL estimate in exact integer arithmetic.
    s_scaled = sum(2^(RMAX-rho)) + (m-used)*2^RMAX (an empty bucket
    contributes 2^-0 = 1, scaled by 2^RMAX); est = ALPHA_NUM*m^2*2^RMAX
    DIV (ALPHA_DEN*s_scaled).  Runs on the <=m-row register frame."""
    big = 1 << HLL_RMAX
    agg = registers.agg(
        F.count("*").cast("long").alias("used_buckets"),
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), "
                     f"{HLL_RMAX} - CAST(rho AS INT))"))
        .cast("long").alias("_s_used"))
    return agg.selectExpr(
        f"CAST({HLL_M} AS BIGINT) AS m",
        "used_buckets",
        f"_s_used + ({HLL_M} - used_buckets) * CAST({big} AS BIGINT) "
        "AS s_scaled",
        f"CAST(({HLL_ALPHA_NUM} * {HLL_M} * {HLL_M} * "
        f"CAST({big} AS BIGINT)) DIV ({HLL_ALPHA_DEN} * "
        f"(_s_used + ({HLL_M} - used_buckets) * CAST({big} AS BIGINT))) "
        "AS BIGINT) AS hll_est")


# ------------------------------------------------------------ Bloom filter

# Deterministic Bloom-filter semi-join — the runtime-filter mechanic
# behind big-join pruning, as a first-class operator: build a bit set
# from the (small) build side's keys, broadcast it, and pre-filter the
# big probe side BEFORE any shuffle; the real join afterwards removes
# the false positives.  k=3 independent positions come from the same
# splitmix64 avalanche under three committed seed offsets, so the
# filter — including its false-positive SET — is a pure function of
# the build keys: the DuckDB twin reproduces it exactly, which turns
# "approximate" membership into a hash-exact driver oracle (the CMS /
# HLL move again: the approximation is the FP-rate guarantee
# (1 - e^(-kn/m))^k, pytest, never wobble).

BLOOM_SEEDS = (0, 1_000_000_007, 998_244_353)


def _bloom_pos_udf(m_bits: int):
    from engine.text.dedup import _mix64

    @F.pandas_udf("array<long>")
    def pos(s: pd.Series) -> pd.Series:
        x = s.to_numpy(dtype="int64").view(np.uint64)
        cols = [(_mix64((x + np.uint64(seed)).copy())
                 % np.uint64(m_bits)).astype(np.int64)
                for seed in BLOOM_SEEDS]
        return pd.Series(np.stack(cols, axis=1).tolist())
    return pos


def bloom_build(df: DataFrame, key_col: str,
                m_bits: int = 512) -> DataFrame:
    """-> (pos): the DISTINCT set bit positions of the build side's
    keys.  <= m_bits rows — broadcast-sized by construction.  One
    Arrow-batched hash projection + one tiny distinct."""
    pos = _bloom_pos_udf(m_bits)
    return (df.select(F.explode(pos(F.col(key_col).cast("long")))
                      .alias("pos")).distinct())


def bloom_probe(probe: DataFrame, key_col: str, bits: DataFrame,
                m_bits: int = 512) -> DataFrame:
    """Keep exactly the probe rows whose k positions are ALL set.
    The bit set is folded into ONE sorted-array row and broadcast; the
    membership test is a native `forall(array_contains)` projection —
    ZERO probe-side shuffle (the whole point of a runtime filter: the
    big side is filtered in place before any exchange).  m_bits bounds
    the broadcast at one array of <= m_bits longs."""
    pos = _bloom_pos_udf(m_bits)
    arr = bits.agg(F.sort_array(F.collect_list("pos")).alias("_bits"))
    return (probe
            .withColumn("_pos", pos(F.col(key_col).cast("long")))
            .crossJoin(F.broadcast(arr))
            .filter(F.expr("forall(_pos, p -> array_contains(_bits, p))"))
            .drop("_pos", "_bits"))


def presence_bitmap(df: DataFrame, grp_col: str, val_col: str,
                    domain: int = 1024) -> DataFrame:
    """Exact presence bitmap per group (E17, r5 post-window) — the
    bitmap-index primitive OLAP engines build distinct-count rollups
    on: values in the bounded integer domain [0, `domain`) are packed
    into 64-bit words, one output row per NON-EMPTY (group, word) ->
    (grp, word, bits, pop).

    bits is the exact two's-complement int64 whose bit (v mod 64) is
    set iff value v with v DIV 64 = word occurs in the group; pop =
    bit_count(bits), so SUM(pop) per group IS the exact distinct
    count.  bit_or is commutative/associative/idempotent — the bitmap
    is a pure function of the value SET (duplicate- and order-blind),
    which is both why it merges across partitions/snapshots for free
    (OR of bitmaps = bitmap of union, the merge law pytest proves)
    and why a DuckDB twin over the same packing is hash-exact.

    Scale shape: ONE map-side-combined groupBy(grp, word) bit_or — the
    partial aggregation collapses every duplicate value inside a task
    before the shuffle, so a group ships at most domain/64 skinny rows
    per task regardless of row count.  Values outside the domain are a
    contract violation and raise in-plan (the vectile-cap philosophy:
    loud, not silent).  Native integer codegen, zero Python."""
    v = F.col(val_col).cast("long")
    guard = F.when((v < 0) | (v >= domain),
                   F.raise_error(F.concat(
                       F.lit("presence_bitmap: value out of domain: "),
                       v.cast("string")))).otherwise(v)
    base = df.select(F.col(grp_col).alias("grp"), guard.alias("v"))
    return (base
            .select("grp", F.expr("v DIV 64").alias("word"),
                    F.expr("shiftleft(CAST(1 AS BIGINT), "
                           "CAST(v % 64 AS INT))").alias("m"))
            .groupBy("grp", "word")
            .agg(F.expr("bit_or(m)").alias("bits"))
            .select("grp", "word", "bits",
                    F.expr("bit_count(bits)").cast("long").alias("pop")))
