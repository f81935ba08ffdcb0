"""Product quantization: codebook determinism, the ADC global-minimum
theorem preconditions the driver key rests on, native-plan shape, and
honest natural-data recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.ml.ann import (
    _adc_lut, adc_dist_expr, cosine_topk, make_pq_encode_udf, pq_topk,
    pq_train,
)

DIM, M_SUB, N_CODES = 64, 8, 16
QVEC = [float((i * 37 % 19) - 9) / 10.0 for i in range(64)]


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
            .select("vec_id", "embedding"))


@pytest.fixture(scope="module")
def books(emb):
    return pq_train(emb, m_sub=M_SUB, n_codes=N_CODES, dim=DIM)


def test_train_shape_and_determinism(emb, books):
    assert books.shape == (M_SUB, N_CODES, DIM // M_SUB)
    again = pq_train(emb, m_sub=M_SUB, n_codes=N_CODES, dim=DIM)
    assert np.array_equal(books, again)


def test_encode_matches_numpy_argmin(spark, emb, books):
    rows = emb.orderBy("vec_id").limit(32).collect()
    got = (emb.orderBy("vec_id").limit(32)
           .withColumn("codes", make_pq_encode_udf(books)(F.col("embedding")))
           .orderBy("vec_id").select("codes").collect())
    dsub = DIM // M_SUB
    for r, g in zip(rows, got):
        x = np.asarray(r.embedding, np.float64)
        x = x / max(np.linalg.norm(x), 1e-12)
        for m in range(M_SUB):
            xs = x[m * dsub:(m + 1) * dsub]
            d2 = ((books[m] - xs) ** 2).sum(axis=1)
            assert g.codes[m] == int(np.argmin(d2))


def test_planted_copy_attains_global_min_with_margin(spark, emb, books):
    """The driver-key theorem's preconditions: (a) an exact query copy
    encodes to the per-subvector argmin codes, so its ADC distance is
    sum(per-sub minima) — the global minimum; (b) no natural row comes
    within a non-ULP margin of that minimum, so the planted set cannot
    be displaced from the rerank pool."""
    lut = _adc_lut(QVEC, books)
    global_min = float(lut.min(axis=1).sum())
    encoded = emb.withColumn(
        "codes", make_pq_encode_udf(books)(F.col("embedding")))
    scored = encoded.withColumn(
        "adc_dist", F.expr(adc_dist_expr("codes", lut)))
    nat_min = scored.agg(F.min("adc_dist")).collect()[0][0]
    # float32 round-trip of the planted copy shifts its ADC by ~1e-6;
    # require a 1000x larger natural margin
    assert nat_min - global_min > 1e-3
    # and the planted copy really encodes to the argmin codes
    qarr = "cast(array(" + ", ".join(repr(float(v)) for v in QVEC) + \
        ") as array<float>)"
    planted = spark.range(1).select(F.expr(qarr).alias("embedding"))
    codes = planted.withColumn(
        "codes", make_pq_encode_udf(books)(F.col("embedding"))
    ).collect()[0].codes
    assert list(codes) == [int(np.argmin(lut[m])) for m in range(M_SUB)]


def test_pq_topk_exact_on_planted(spark, emb, books):
    qarr = "cast(array(" + ", ".join(repr(float(v)) for v in QVEC) + \
        ") as array<float>)"
    planted = spark.range(10).select(
        (F.col("id") + 100000).alias("vec_id"), F.expr(qarr).alias("embedding"))
    union = emb.unionByName(planted)
    books_u = pq_train(union, m_sub=M_SUB, n_codes=N_CODES, dim=DIM)
    got = {r.vec_id for r in pq_topk(union, QVEC, 10, books_u,
                                     rerank=64).collect()}
    assert got == {100000 + i for i in range(10)}


def test_pq_topk_natural_recall(emb, books):
    """Honest approximate behavior on natural data: rerank=64 over the
    small fixture recovers most of the exact top-10."""
    exact = [r.vec_id for r in cosine_topk(emb, QVEC, 10).collect()]
    approx = {r.vec_id for r in pq_topk(emb, QVEC, 10, books,
                                        rerank=64).collect()}
    assert len(approx & set(exact)) >= 7
    # top-1 is found (it survives any reasonable candidate pool)
    assert exact[0] in approx


def test_adc_scan_is_native(emb, books):
    """The scoring scan must stay JVM-side: exactly ONE ArrowEvalPython
    (the encode) and no Python in the ADC aggregate."""
    encoded = emb.withColumn(
        "codes", make_pq_encode_udf(books)(F.col("embedding")))
    lut = _adc_lut(QVEC, books)
    scored = encoded.withColumn("adc_dist", F.expr(adc_dist_expr("codes", lut)))
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "BatchEvalPython" not in plan


def test_tiny_table_codebooks_are_initialized_and_deterministic(emb):
    """r4 ADVICE: when the sample holds fewer rows than n_codes, the
    unused codebook rows must be deterministic (cycled real centroids),
    never uninitialized memory — and encode must still pick a REAL
    centroid (argmin ties to the lowest code, so padded duplicates can't
    win)."""
    tiny = emb.orderBy("vec_id").limit(5)
    b1 = pq_train(tiny, m_sub=M_SUB, n_codes=N_CODES, dim=DIM)
    b2 = pq_train(tiny, m_sub=M_SUB, n_codes=N_CODES, dim=DIM)
    assert np.array_equal(b1, b2)
    assert np.isfinite(b1).all()
    # every padded row duplicates a real centroid
    for m in range(M_SUB):
        real = b1[m, :5]
        for c in range(5, N_CODES):
            assert any(np.array_equal(b1[m, c], r) for r in real)
    # encode never selects a padded (duplicate) code
    enc = (tiny.withColumn("codes", make_pq_encode_udf(b1)(F.col("embedding")))
           .select("codes").collect())
    assert all(c < 5 for r in enc for c in r.codes)
