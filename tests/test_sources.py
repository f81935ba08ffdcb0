"""A10/A11 — CSV and JSON source/sink roundtrip robustness."""

from __future__ import annotations

import tempfile


def test_csv_roundtrip_quoting(spark):
    """Commas, double quotes, leading zeros, empty strings and NULLs
    must survive the write->read roundtrip with an explicit schema."""
    rows = [(1, 'plain'), (2, 'has,comma'), (3, 'has "quotes"'),
            (4, ''), (5, None), (6, ' leading and trailing '),
            (7, '007'), (8, 'unicode: å∂ß')]
    df = spark.createDataFrame(rows, "id long, s string")
    root = tempfile.mkdtemp(prefix="csv-rt-")
    # NB: the CSV WRITER trims cell whitespace by default
    # (ignoreLeading/TrailingWhiteSpace default true on write) — turn
    # it off for a faithful roundtrip.
    (df.repartition(3).write.mode("overwrite").option("header", True)
     .option("ignoreLeadingWhiteSpace", False)
     .option("ignoreTrailingWhiteSpace", False).csv(root))
    back = (spark.read.schema("id long, s string")
            .option("header", True).csv(root))
    got = {r.id: r.s for r in back.collect()}
    exp = dict(rows)
    # CSV cannot distinguish empty string from NULL on read-back:
    # Spark reads both as NULL with default options.  Assert the
    # documented convention rather than pretending otherwise.
    exp[4] = None
    assert got == exp


def test_json_roundtrip_types_and_nulls(spark):
    rows = [(1, 'a"b\\c', 10**17, None),
            (2, None, -5, 123456),
            (3, 'line\nbreak', 0, 0)]
    df = spark.createDataFrame(rows, "id long, s string, big long, n long")
    root = tempfile.mkdtemp(prefix="json-rt-")
    df.repartition(2).write.mode("overwrite").json(root)
    back = spark.read.schema("id long, s string, big long, n long").json(root)
    got = {r.id: (r.s, r.big, r.n) for r in back.collect()}
    assert got == {i: (s, b, n) for i, s, b, n in rows}


def test_explicit_schema_means_no_inference_job(spark):
    """With a user schema the CSV read must not run an inference scan:
    the returned plan's schema is exactly the declared one even when
    the data would infer differently."""
    root = tempfile.mkdtemp(prefix="csv-schema-")
    spark.createDataFrame([(1, "2"), (3, "4")], "a long, b string") \
        .write.mode("overwrite").option("header", True).csv(root)
    df = (spark.read.schema("a string, b long")
          .option("header", True).csv(root))
    assert [f.dataType.simpleString() for f in df.schema.fields] \
        == ["string", "bigint"]
