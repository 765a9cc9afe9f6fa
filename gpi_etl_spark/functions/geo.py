"""Geodesic helpers as native column expressions.

Reference computes point-to-point distance with geopy's WGS-84 geodesic
inside an iterrows loop (HTIPPLSITE/__init__.py:318-322) and with SQL
Server ``geography::Point(..).STDistance`` (HTIPPLSITE/__init__.py:114).
Here it is a single Haversine column expression: fully codegen'd,
vectorized, shuffle-free — the right primitive at 100 TB. Haversine
(sphere, R=6371008.8 m mean Earth radius) differs from the ellipsoid by
<0.5%; callers that need ellipsoid parity can wrap geopy in a pandas_udf
(see operators/geo_knn), but nothing in the engine's own surface does.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_M = 6371008.8


def haversine_meters(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """Great-circle distance in meters between two (lat, lon) pairs.

    Pure `pyspark.sql.functions` arithmetic — Catalyst folds constants
    and the whole thing stays inside one codegen stage.
    """
    lat1, lon1, lat2, lon2 = (
        F.col(c) if isinstance(c, str) else c for c in (lat1, lon1, lat2, lon2)
    )
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.pow(F.sin(dlon / 2), 2)
    )
    # clamp: float error near antipodes can push a to 1 + ulp, and
    # asin(sqrt(>1)) is NaN — clamp on BOTH engines (see the SQL twin)
    return F.lit(2 * EARTH_RADIUS_M) * F.asin(F.sqrt(F.least(a, F.lit(1.0))))


def haversine_meters_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """The same Haversine as ANSI SQL text (for oracles / spark.sql).

    Kept textually parallel to :func:`haversine_meters` so Spark and
    DuckDB evaluate bit-comparable doubles.
    """
    return (
        f"2 * {EARTH_RADIUS_M} * asin(sqrt(least(1.0, "
        f"pow(sin(radians({lat2} - {lat1}) / 2), 2) + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"pow(sin(radians({lon2} - {lon1}) / 2), 2))))"
    )
