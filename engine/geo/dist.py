"""C8 — haversine great-circle distance (SURVEY.md §2.C8; kNN ranking,
BASELINE.json:6).

Two forms:
- `haversine_expr`: native column expression (JVM trig, whole-stage
  codegen) — the hot path inside kNN at scale.
- `haversine_udf`: Arrow-batched numpy form — bitwise-identical to the
  pure-Python oracle and to DuckDB (all three use C libm), used where the
  driver's DuckDB value-hash comparison demands exact doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from oracle.geo import EARTH_RADIUS_M


def haversine_expr(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    p1, p2 = F.radians(lat1), F.radians(lat2)
    dp = p2 - p1
    dl = F.radians(lon2) - F.radians(lon1)
    a = F.pow(F.sin(dp / 2), 2) + F.cos(p1) * F.cos(p2) * F.pow(F.sin(dl / 2), 2)
    return 2 * F.lit(EARTH_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(a)))


def haversine_np(lon1, lat1, lon2, lat2) -> np.ndarray:
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lon2) - np.radians(lon1)
    a = np.sin(dp / 2.0) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2.0) ** 2
    return 2.0 * EARTH_RADIUS_M * np.arcsin(np.minimum(1.0, np.sqrt(a)))


@F.pandas_udf(DoubleType())
def haversine_udf(lon1: pd.Series, lat1: pd.Series,
                  lon2: pd.Series, lat2: pd.Series) -> pd.Series:
    return pd.Series(
        haversine_np(
            lon1.to_numpy(np.float64), lat1.to_numpy(np.float64),
            lon2.to_numpy(np.float64), lat2.to_numpy(np.float64),
        )
    )
