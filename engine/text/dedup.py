"""Deduplication operators for training-data pipelines (task brief):
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale shapes:
- exact dedup: one hash-aggregate shuffle on the dedup key;
- MinHash+LSH: signatures via one Arrow-batched pandas UDF pass, then
  explode(bands) -> groupBy(bucket) -> within-bucket pairs — candidate
  generation never compares across buckets, so cost is ~sum(bucket^2)
  instead of n^2;
- SimHash: 64-bit signature + native `bit_count(xor)` Hamming prefilter
  (same trick as the image phash, engine/image/phash.py);
- n-gram Jaccard: exact verification on candidate pairs only, native
  array_intersect/array_union;
- embedding cosine: see engine/ml/ann.py.

Hashing uses md5 (hashlib) folded to 64 bits — stable across processes,
partitions and Python versions (never the builtin `hash`).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE = (1 << 61) - 1


def _stable64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode()).digest()[:8], "big")


def char_shingles(text: str, k: int = 4) -> set[str]:
    if len(text) < k:
        return {text}
    return {text[i:i + k] for i in range(len(text) - k + 1)}


# ------------------------------------------------------------ exact dedup

def exact_dedup(df: DataFrame, key_cols: list[str],
                id_col: str = "doc_id") -> DataFrame:
    """Representative (min id) + multiplicity per distinct key."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias("rep_id"), F.count("*").alias("dup_count")
    )


# --------------------------------------------------------------- minhash

def _minhash_params(num_hashes: int, seed: int = 42):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE, num_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE, num_hashes, dtype=np.int64)
    return a, b


def minhash_signature(text: str, num_hashes: int = 32, k: int = 4,
                      seed: int = 42) -> list[int]:
    """Oracle-form single-doc signature (pure sequential)."""
    a, b = _minhash_params(num_hashes, seed)
    vals = np.array([_stable64(s) % MERSENNE for s in char_shingles(text, k)],
                    dtype=np.int64)
    sig = ((a[None, :].astype(object) * vals[:, None].astype(object) + b) % MERSENNE)
    return [int(v) for v in sig.min(axis=0)]


def make_minhash_udf(num_hashes: int = 32, k: int = 4, seed: int = 42):
    a, b = _minhash_params(num_hashes, seed)

    @F.pandas_udf(ArrayType(LongType()))
    def minhash_udf(text: pd.Series) -> pd.Series:
        out = []
        ao, bo = a.astype(object), b.astype(object)  # avoid int64 overflow
        for t in text:
            vals = np.array([_stable64(s) % MERSENNE
                             for s in char_shingles(t, k)], dtype=object)
            sig = (ao[None, :] * vals[:, None] + bo) % MERSENNE
            out.append([int(v) for v in sig.min(axis=0)])
        return pd.Series(out)

    return minhash_udf


def lsh_candidate_pairs(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", num_hashes: int = 32,
                        bands: int = 8, k: int = 4, seed: int = 42) -> DataFrame:
    """MinHash+LSH candidate pairs (a < b).  rows_per_band =
    num_hashes/bands; docs sharing any band bucket become candidates."""
    assert num_hashes % bands == 0
    rpb = num_hashes // bands
    sig = df.select(
        F.col(id_col), make_minhash_udf(num_hashes, k, seed)(F.col(text_col)).alias("sig")
    )
    banded = sig.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b as band, xxhash64(slice(sig, b*{rpb}+1, {rpb})) as bucket))"
            )
        ).alias("bb"),
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_dedup(df: DataFrame, *, id_col: str = "doc_id",
                  text_col: str = "text", threshold: float = 0.7,
                  num_hashes: int = 32, bands: int = 8, k: int = 4,
                  seed: int = 42) -> DataFrame:
    """Candidate pairs verified by exact shingle Jaccard >= threshold."""
    pairs = lsh_candidate_pairs(df, id_col=id_col, text_col=text_col,
                                num_hashes=num_hashes, bands=bands, k=k,
                                seed=seed)
    sh = df.select(
        F.col(id_col),
        F.array_distinct(
            F.expr(
                f"transform(sequence(0, greatest(length({text_col}) - {k}, 0)), "
                f"i -> substring({text_col}, i + 1, {k}))"
            )
        ).alias("shingles"),
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# --------------------------------------------------------------- simhash

def simhash64(text: str, k: int = 4) -> int:
    """Oracle-form 64-bit SimHash over char shingles."""
    acc = [0] * 64
    for s in char_shingles(text, k):
        h = _stable64(s)
        for i in range(64):
            acc[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def make_simhash_udf(k: int = 4):
    @F.pandas_udf(LongType())
    def simhash_udf(text: pd.Series) -> pd.Series:
        return pd.Series([simhash64(t, k) for t in text], dtype="int64")

    return simhash_udf


def simhash_near_dups(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", max_dist: int = 8,
                      k: int = 4, band_bits: int = 16) -> DataFrame:
    """Near-dup pairs by SimHash: block on 16-bit bands (a pair within
    hamming distance <= 3 shares at least one of 4 bands; larger max_dist
    uses the bands as a recall-oriented blocker), verify with native
    bit_count(xor)."""
    sigs = df.select(F.col(id_col),
                     make_simhash_udf(k)(F.col(text_col)).alias("sim"))
    nbands = 64 // band_bits
    banded = sigs.select(
        id_col, "sim",
        F.explode(
            F.expr(
                f"transform(sequence(0, {nbands - 1}), "
                f"b -> struct(b as band, "
                f"shiftright(sim, b * {band_bits}) & {(1 << band_bits) - 1} as bucket))"
            )
        ).alias("bb"),
    ).select(id_col, "sim", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    l = banded.alias("l")
    r = banded.alias("r")
    return (
        l.join(r, ["band", "bucket"])
        .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("id_a"),
                F.col(f"r.{id_col}").alias("id_b"),
                F.col("l.sim").alias("sim_a"), F.col("r.sim").alias("sim_b"))
        .distinct()
        .withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_dist)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------- ngram jaccard

def ngram_jaccard_vs_query(df: DataFrame, query_text_id, *,
                           id_col: str = "doc_id", text_col: str = "text",
                           n: int = 3) -> DataFrame:
    """Word n-gram Jaccard of every doc against one query doc (by id) —
    native array ops, SQL-oracle-able."""
    grams = F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(size(split({text_col}, ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split({text_col}, ' '), i, {n})))"
    ))
    g = df.select(F.col(id_col), grams.alias("grams"))
    q = g.filter(F.col(id_col) == query_text_id) \
         .select(F.col("grams").alias("q_grams"))
    return (
        g.crossJoin(F.broadcast(q))
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("grams", "q_grams"))
                / F.size(F.array_union("grams", "q_grams")), 6),
        )
        .select(id_col, "jaccard")
    )
