"""A4 — deterministic synthetic image+caption table generator
(SURVEY.md §2.A4; FIXTURES.md §1; task brief "synthesise it
deterministically at small scale ... no external data").

Schema = input_hint (BASELINE.json:15) seven columns + lat/lon geotags
(BASELINE.json:6 "rows are geotagged"; FIXTURES.md §1).  Generation is a
pure function of (seed, row index): per-row numpy PCG64 seeded with
[seed, i], so the table is identical regardless of partition count or
executor placement — the property the resume/diff tests rely on
(SURVEY.md §7.4.5).

Runs as `spark.range(n)` -> mapInPandas: generation is distributed, the
driver never holds rows.  ~10% of rows land in one hot cell
(skew fixtures), ~1% hug the antimeridian (FIXTURES.md §1).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType, DoubleType, IntegerType, LongType, StringType, StructField,
    StructType,
)

from engine.image.codec import decode, encode
from engine.image.phash import phash64

HOT_LON, HOT_LAT = 2.2945, 48.8584      # inside fixture polygon P11
MAX_LAT = 85.05112878
SIZES = (16, 32, 64)
FORMAT_CYCLE = ("rgb8", "png", "jq")

VOCAB = (
    "amber basin cliff delta ember fjord grove harbor inlet juniper knoll "
    "lagoon meadow nectar orchid prairie quarry ridge summit tundra upland "
    "valley willow zenith bridge canyon desert estuary forest glacier "
    "horizon island jungle lake mountain ocean plateau river steppe trail "
    "urban village waterfall yard zone aurora breeze current dusk eclipse "
    "frost gale haze ice jetstream karst loam mist nimbus overcast plume "
    "quartz rain"
).split()

IMAGES_SCHEMA = StructType([
    StructField("image_id", StringType(), False),
    StructField("bytes", BinaryType(), False),
    StructField("w", IntegerType(), False),
    StructField("h", IntegerType(), False),
    StructField("fmt", StringType(), False),
    StructField("caption", StringType(), False),
    StructField("phash", LongType(), False),
    StructField("lat", DoubleType(), False),
    StructField("lon", DoubleType(), False),
])


def synth_row(i: int, seed: int = 42, hot_frac: float = 0.10,
              anti_frac: float = 0.01) -> tuple:
    """One deterministic row — pure function of (seed, i)."""
    rng = np.random.default_rng([seed, i])
    w = int(rng.choice(SIZES))
    h = int(rng.choice(SIZES))
    fmt = FORMAT_CYCLE[i % 3]
    # gradient + noise pixels
    gy = np.linspace(0, 255, h)[:, None]
    gx = np.linspace(0, 255, w)[None, :]
    base = np.stack(
        [gy + gx * 0.0, gy * 0.0 + gx, (gy + gx) / 2.0], axis=2
    )
    noise = rng.normal(0, 24.0, (h, w, 3))
    phase = rng.uniform(0, 2 * np.pi)
    wave = 40.0 * np.sin(gx / 16.0 + phase)[..., None]
    pix = np.clip(base + noise + wave, 0, 255).astype(np.uint8)
    data = encode(pix, fmt)
    ph = phash64(decode(data, w, h, fmt))
    nwords = int(rng.integers(5, 13))
    caption = " ".join(VOCAB[j] for j in rng.integers(0, len(VOCAB), nwords))
    u = rng.uniform()
    if u < hot_frac:
        lat = HOT_LAT + rng.uniform(-0.02, 0.02)
        lon = HOT_LON + rng.uniform(-0.02, 0.02)
    elif u < hot_frac + anti_frac:
        lat = rng.uniform(-MAX_LAT, MAX_LAT)
        lon = 180.0 - rng.uniform(0, 0.1) if rng.uniform() < 0.5 \
            else -180.0 + rng.uniform(0, 0.1)
    else:
        lat = rng.uniform(-MAX_LAT, MAX_LAT)
        lon = rng.uniform(-180.0, 180.0)
    return (f"img{i:012d}", data, w, h, fmt, caption, int(ph),
            float(lat), float(lon))


def gen_images(spark: SparkSession, n: int, seed: int = 42,
               parts: int | None = None, hot_frac: float = 0.10,
               anti_frac: float = 0.01) -> DataFrame:
    """Distributed deterministic generator -> images DataFrame."""
    base = spark.range(0, n, numPartitions=parts) if parts \
        else spark.range(0, n)
    cols = [f.name for f in IMAGES_SCHEMA.fields]

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [synth_row(int(i), seed, hot_frac, anti_frac)
                    for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=cols)

    return base.mapInPandas(_gen, schema=IMAGES_SCHEMA)


def _mix64(v: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized) — deterministic per-row stream."""
    u = np.uint64
    v = (v.astype(u) + u(0x9E3779B97F4A7C15))
    v = (v ^ (v >> u(30))) * u(0xBF58476D1CE4E5B9)
    v = (v ^ (v >> u(27))) * u(0x94D049BB133111EB)
    return v ^ (v >> u(31))


def _unit(v: np.ndarray) -> np.ndarray:
    return _mix64(v).astype(np.float64) / float(1 << 64)


POINTS_SCHEMA = StructType([
    StructField("image_id", StringType(), False),
    StructField("lat", DoubleType(), False),
    StructField("lon", DoubleType(), False),
])


def gen_points(spark: SparkSession, n: int, seed: int = 42,
               parts: int | None = None, hot_frac: float = 0.10,
               anti_frac: float = 0.01) -> DataFrame:
    """The NARROW projection of the image table — (image_id, lat, lon)
    with the same geotag distribution (hot cell, antimeridian band) but
    no pixel payload.  Used for scale benchmarks where n makes per-row
    image synthesis impractical: the spatial pipeline reads exactly
    these columns from the full table anyway (bytes are pruned at the
    scan), so throughput on this table equals throughput on the real
    one.  Fully vectorized: a counter-based hash stream, no per-row RNG
    objects, identical rows regardless of partitioning."""
    base = spark.range(0, n, numPartitions=parts) if parts \
        else spark.range(0, n)

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        s = np.uint64(seed) * np.uint64(0x100000001B3)
        for pdf in batches:
            i = pdf["id"].to_numpy(np.uint64)
            u_kind = _unit(i * np.uint64(4) + s)
            u_lat = _unit(i * np.uint64(4) + np.uint64(1) + s)
            u_lon = _unit(i * np.uint64(4) + np.uint64(2) + s)
            u_side = _unit(i * np.uint64(4) + np.uint64(3) + s)
            lat = -MAX_LAT + u_lat * (2 * MAX_LAT)
            lon = -180.0 + u_lon * 360.0
            hot = u_kind < hot_frac
            lat = np.where(hot, HOT_LAT - 0.02 + u_lat * 0.04, lat)
            lon = np.where(hot, HOT_LON - 0.02 + u_lon * 0.04, lon)
            anti = (~hot) & (u_kind < hot_frac + anti_frac)
            lon = np.where(anti,
                           np.where(u_side < 0.5, 180.0 - u_lon * 0.1,
                                    -180.0 + u_lon * 0.1), lon)
            yield pd.DataFrame({
                "image_id": [f"img{int(v):012d}" for v in i],
                "lat": lat, "lon": lon,
            })

    return base.mapInPandas(_gen, schema=POINTS_SCHEMA)


def gen_images_local(n: int, seed: int = 42, hot_frac: float = 0.10,
                     anti_frac: float = 0.01) -> pd.DataFrame:
    """Driver-local small-scale generator for tests (same rows)."""
    cols = [f.name for f in IMAGES_SCHEMA.fields]
    return pd.DataFrame(
        [synth_row(i, seed, hot_frac, anti_frac) for i in range(n)],
        columns=cols,
    )
