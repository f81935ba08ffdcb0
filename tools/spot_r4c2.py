"""At-scale spot runs for the r4-continuation-2 operators (BASELINE.md
protocol: local[32], synthetic in-memory inputs via spark.range so the
number measures the operator, not parquet IO; single runs, +-host
drift).  Usage: python tools/spot_r4c2.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from engine.session import get_spark  # noqa: E402


def run(name, fn, spark):
    t0 = time.time()
    n_out = fn(spark)
    dt = time.time() - t0
    print(json.dumps({"op": name, "rows_out": n_out,
                      "sec": round(dt, 1)}), flush=True)


def sssp(spark):
    # 10M edges / 1M nodes, integer weights, 5 sources, 6 rounds
    from engine.graph import sssp_int
    e = spark.range(10_000_000).selectExpr(
        "id % 1000000 AS src",
        "(id * 2654435761) % 1000000 AS dst",
        "1 + (id % 97) AS w")
    s = spark.createDataFrame([(i,) for i in range(5)], "node long")
    return sssp_int(e, s, max_hops=6).count()


def interval(spark):
    # 20M x 20M bounded-span intervals over ~30 days, 1h bucket
    from engine.relops import interval_join
    def side(tag):
        return spark.range(20_000_000).selectExpr(
            f"id AS {tag}",
            f"(id * 2654435761) % 2592000000000 AS s").selectExpr(
            tag, "s", "s + 1 + (id * 40503) % 3600000000 AS e")
    return interval_join(side("a_id"), side("b_id"), a_id="a_id",
                         b_id="b_id", bucket=3_600_000_000).count()


def bloom(spark):
    # 100k build keys vs 500M probe rows
    from engine.sketch import bloom_build, bloom_probe
    build = spark.range(100_000).selectExpr("id * 37 AS k")
    probe = spark.range(500_000_000).selectExpr("id AS k")
    bits = bloom_build(build, "k", m_bits=1 << 20)
    return bloom_probe(probe, "k", bits, m_bits=1 << 20).count()


def hll(spark):
    from engine.sketch import hll_build, hll_estimate
    df = spark.range(500_000_000).selectExpr("id % 50000000 AS k")
    row = hll_estimate(hll_build(df, "k")).collect()[0]
    print("   hll est", row["hll_est"], "truth 50000000", flush=True)
    return 1


def resample(spark):
    # 50M points / 1M tracks -> hourly grid over each track's span
    from engine.geo.traj import traj_resample
    pts = spark.range(50_000_000).selectExpr(
        "id % 1000000 AS user_id",
        "(id DIV 1000000) * 3600000000 + (id * 2654435761) % 3600000000 "
        "AS us",
        "(id * 40503) % 360000000 AS x",
        "(id * 97) % 170000000 AS y",
        "id AS seq")
    return traj_resample(pts, grid_us=3_600_000_000).count()


def mad(spark):
    from engine.relops import mad_outliers
    ev = spark.range(200_000_000).selectExpr(
        "id % 1000000 AS user_id", "id AS event_id",
        "(id * 2654435761) % 100000 AS cents")
    return mad_outliers(ev, "user_id", "cents", "event_id").count()


def cohort(spark):
    from engine.relops import cohort_retention
    ev = spark.range(500_000_000).selectExpr(
        "id % 5000000 AS user_id",
        "timestamp_micros(1704067200000000 + (id * 2654435761) % "
        "5184000000000) AS ts")
    return cohort_retention(ev, bucket_s=7 * 86400).count()


def components(spark):
    from engine.text.dedup import connected_components
    e = spark.range(10_000_000).selectExpr(
        "id % 2000000 AS id_a", "(id * 2654435761) % 2000000 AS id_b")
    return connected_components(e.filter("id_a <> id_b")).count()


SPOTS = {"sssp": sssp, "interval": interval, "bloom": bloom, "hll": hll,
         "resample": resample, "mad": mad, "cohort": cohort,
         "components": components}


def main():
    spark = get_spark("spot-r4c2", master="local[32]",
                      extra={"spark.ui.showConsoleProgress": "false",
                             "spark.driver.memory": "48g"})
    spark.sparkContext.setLogLevel("ERROR")
    only = sys.argv[1:]
    for name, fn in SPOTS.items():
        if only and name not in only:
            continue
        run(name, fn, spark)


if __name__ == "__main__":
    main()
