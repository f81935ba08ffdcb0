"""B3 — bbox-filtered extracts (BASELINE.json:6,14 "bbox-filtered extracts").

Expressed as native conjunctive range predicates so Catalyst pushes them
into the Parquet scan (row-group min/max pruning) — verified in
tests/test_plans.py by asserting PushedFilters in the formatted plan.
Never wrap these in a UDF (SURVEY.md §4).

Antimeridian-crossing boxes (minlon > maxlon) split into the OR of two
ordinary boxes — still pushdown-able (Parquet accepts OR of ranges).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bbox_predicate(minlon: float, minlat: float, maxlon: float, maxlat: float,
                   lon_col: str = "lon", lat_col: str = "lat") -> Column:
    lon, lat = F.col(lon_col), F.col(lat_col)
    lat_ok = (lat >= minlat) & (lat <= maxlat)
    if minlon <= maxlon:
        return (lon >= minlon) & (lon <= maxlon) & lat_ok
    # crosses the antimeridian: [minlon, 180] U [-180, maxlon]
    return ((lon >= minlon) | (lon <= maxlon)) & lat_ok


def bbox_filter(df: DataFrame, bbox: tuple[float, float, float, float],
                lon_col: str = "lon", lat_col: str = "lat") -> DataFrame:
    minlon, minlat, maxlon, maxlat = bbox
    return df.filter(bbox_predicate(minlon, minlat, maxlon, maxlat, lon_col, lat_col))
