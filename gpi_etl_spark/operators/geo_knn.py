"""Geo k-nearest-neighbor (the reference's J2 theta-join).

Reference: SQL Server ``TOP 3 … ORDER BY geography::Point(...)
.STDistance`` + ``ROW_NUMBER()`` per query point (HTIPPLSITE/__init__
.py:105-121; clones HTIPNEXSITE:106-122, HTIPPLSITECR:104-120).

kNN by distance is not an equi-join, so the scale strategy is tiered:

1. few query points × big store table → broadcast the query points,
   compute Haversine per (query, store) pair, window top-k — one pass
   over the store table, no shuffle of the big side beyond the top-k
   partial sort;
2. many query points × many stores → geohash-band both sides first
   (``bucketed_knn``): an equi-join on coarse cells + neighbor cells
   bounds the candidate set, then exact Haversine + top-k. Cell size
   must exceed the search radius so no true neighbor is missed.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gpi_etl_spark.functions.geo import haversine_meters


def knn_join(
    queries: DataFrame,
    stores: DataFrame,
    k: int = 3,
    query_id: str = "query_id",
    q_lat: str = "lat",
    q_lon: str = "lon",
    s_lat: str = "LTT",
    s_lon: str = "LGT",
    distance_col: str = "mdist",
    round_meters: bool = True,
) -> DataFrame:
    """Top-k nearest ``stores`` per ``queries`` row (broadcast path).

    ``round_meters`` reproduces the reference's ``round(mdist, 0)``
    display rounding (HTIPPLSITE/__init__.py:111) — note the reference
    rounds *before* ranking, so ties at whole meters rank by input
    order; here rounding happens after ranking (deterministic), which
    can only differ on sub-meter ties.
    """
    pairs = stores.crossJoin(F.broadcast(queries))
    dist = haversine_meters(F.col(q_lat), F.col(q_lon), F.col(s_lat), F.col(s_lon))
    pairs = pairs.withColumn(distance_col, dist)
    w = Window.partitionBy(query_id).orderBy(F.col(distance_col).asc())
    out = (
        pairs.withColumn("row_index", F.row_number().over(w))
        .filter(F.col("row_index") <= k)
    )
    if round_meters:
        out = out.withColumn(distance_col, F.round(F.col(distance_col), 0))
    return out


def bucketed_knn(
    queries: DataFrame,
    stores: DataFrame,
    radius_m: float,
    k: int = 3,
    query_id: str = "query_id",
    q_lat: str = "lat",
    q_lon: str = "lon",
    s_lat: str = "LTT",
    s_lon: str = "LGT",
    distance_col: str = "mdist",
    round_rank_to: int | None = None,
    tiebreak: str | None = None,
    max_abs_lat_deg: float = 75.0,
) -> DataFrame:
    """Scale path: grid-cell band join then exact Haversine top-k.

    ``round_rank_to``/``tiebreak`` make the ranking deterministic across
    engines (rank on meters rounded to N digits, then the tiebreak
    column) — needed when the result is hash-compared to an oracle.

    Each store lands in one integer lat/lon cell whose side is ≥ the
    radius in latitude degrees; each query probes ±1 cell of latitude
    and ±``lon_reach`` cells of longitude, where lon_reach compensates
    for longitude degrees shrinking by cos(lat) — sized for the worst
    latitude the data can reach (``max_abs_lat_deg``; polar data needs
    a different scheme). Every true neighbor within ``radius_m`` is
    therefore in some probed cell; candidates beyond the radius are
    filtered before ranking. This replaces the O(Q×S) cross join with
    O(candidates) on an equi-join key.
    """
    import math

    # cell side in degrees: worst-case 1° latitude ≈ 111 km
    cell_deg = max(radius_m / 111_000.0, 1e-4)
    lat_cap = min(abs(max_abs_lat_deg), 89.0)
    # true longitude half-span of a great-circle disk of radius r at
    # latitude φ: asin(sin(r/R) / cos φ) — NOT the planar 1/cos φ
    # (which under-covers at high latitude / large radius)
    r_deg = math.degrees(radius_m / 6_371_008.8)
    if lat_cap + r_deg >= 90.0:
        # the disk can reach the pole: every longitude may hold a
        # neighbor — probe the full circle (correct, just wider; the
        # ±1 latitude reach still holds because |Δφ| ≤ r ≤ cell side)
        lon_span_deg = 180.0
    else:
        sin_ratio = math.sin(math.radians(r_deg)) / math.cos(math.radians(lat_cap))
        lon_span_deg = math.degrees(math.asin(min(1.0, sin_ratio)))
    lon_reach = max(1, math.ceil(lon_span_deg / cell_deg))
    # longitude cells are modular so ±180° wraparound neighbors land in
    # adjacent cell ids (a query at lon 179.9° must see stores at −179.9°)
    n_lon_cells = max(1, math.ceil(360.0 / cell_deg))

    def lon_cell(col: F.Column) -> F.Column:
        return F.pmod(F.floor(col / cell_deg).cast("long"), F.lit(n_lon_cells))

    def cell(lat_col: str, lon_col: str) -> list:
        return [
            F.floor(F.col(lat_col) / cell_deg).cast("long").alias("_cx"),
            lon_cell(F.col(lon_col)).alias("_cy"),
        ]

    s = stores.select("*", *cell(s_lat, s_lon))
    dx = F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("_dx")
    dy = F.explode(
        F.sequence(F.lit(-min(lon_reach, n_lon_cells // 2)),
                   F.lit(min(lon_reach, (n_lon_cells - 1) // 2)))
    ).alias("_dy")
    q = (
        queries.select("*", *cell(q_lat, q_lon))
        .select("*", dx)
        .select("*", dy)
        .withColumn("_cx", F.col("_cx") + F.col("_dx"))
        .withColumn("_cy", F.pmod(F.col("_cy") + F.col("_dy"), F.lit(n_lon_cells)))
        .drop("_dx", "_dy")
    )
    pairs = s.join(q, on=["_cx", "_cy"]).drop("_cx", "_cy")
    dist = haversine_meters(F.col(q_lat), F.col(q_lon), F.col(s_lat), F.col(s_lon))
    pairs = pairs.withColumn(distance_col, dist).filter(
        F.col(distance_col) <= radius_m
    )
    if round_rank_to is not None:
        pairs = pairs.withColumn(
            distance_col, F.round(F.col(distance_col), round_rank_to)
        )
    order = [F.col(distance_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(query_id).orderBy(*order)
    return (
        pairs.withColumn("row_index", F.row_number().over(w))
        .filter(F.col("row_index") <= k)
    )
