"""Haversine + kNN: known distances, broadcast vs banded equivalence."""

import math

from pyspark.sql import functions as F

from gpi_etl_spark.functions.geo import EARTH_RADIUS_M, haversine_meters
from gpi_etl_spark.operators.geo_knn import bucketed_knn, knn_join


def test_haversine_known_values(spark):
    df = spark.createDataFrame(
        [
            (0.0, 0.0, 0.0, 1.0),    # 1° lon at equator
            (0.0, 0.0, 1.0, 0.0),    # 1° lat
            (0.0, 0.0, 0.0, 0.0),    # same point
        ],
        "lat1 double, lon1 double, lat2 double, lon2 double",
    )
    out = [
        r.d
        for r in df.select(
            haversine_meters("lat1", "lon1", "lat2", "lon2").alias("d")
        ).collect()
    ]
    one_degree = EARTH_RADIUS_M * math.pi / 180  # ≈ 111.195 km
    assert abs(out[0] - one_degree) < 1.0
    assert abs(out[1] - one_degree) < 1.0
    assert out[2] == 0.0


def _stores(spark, n=200):
    rows = [
        (f"s{i}", (i * 37 % 600) / 10.0 - 30.0, (i * 91 % 1800) / 10.0 - 90.0, "X")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "POS_NM string, LTT double, LGT double, CTGRY_NM string")


def test_knn_join_top3(spark):
    stores = _stores(spark)
    queries = spark.createDataFrame([(1, 0.0, 0.0)], "query_id int, lat double, lon double")
    out = knn_join(queries, stores, k=3)
    assert out.count() == 3
    dists = [r.mdist for r in out.orderBy("row_index").collect()]
    assert dists == sorted(dists)


def test_bucketed_knn_matches_broadcast_within_radius(spark):
    """The grid-banded scale path must agree with the exact broadcast
    path whenever true neighbors fall inside the radius."""
    stores = _stores(spark)
    queries = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 20.0, 40.0)], "query_id int, lat double, lon double"
    )
    exact = knn_join(queries, stores, k=3, round_meters=False)
    banded = bucketed_knn(queries, stores, radius_m=2_000_000, k=3)
    e = {(r.query_id, r.POS_NM) for r in exact.filter(F.col("mdist") <= 2_000_000).collect()}
    b = {(r.query_id, r.POS_NM) for r in banded.collect()}
    assert b == e


def test_bucketed_knn_high_latitude_no_missed_neighbors(spark):
    """At lat 70° a 100 km radius spans ~3 longitude cells — the probe
    must reach them (longitude degrees shrink by cos(lat))."""
    queries = spark.createDataFrame(
        [(1, 70.0, 0.0)], "query_id int, lat double, lon double"
    )
    # ~96 km east of the query at lat 70 — 2.5 cells of 0.9° longitude
    stores = spark.createDataFrame(
        [("far_east", 70.0, 2.53), ("near", 70.001, 0.0), ("out", 60.0, 0.0)],
        "POS_NM string, LTT double, LGT double",
    )
    got = bucketed_knn(queries, stores, radius_m=100_000, k=3)
    names = {r.POS_NM for r in got.collect()}
    assert names == {"near", "far_east"}


def test_bucketed_knn_finds_across_pole_neighbor(spark):
    """Disk reaching the pole → full-longitude probe: a store on the
    opposite meridian but within radius via the pole must be found."""
    q = spark.createDataFrame([(1, 80.0, 0.0)], "query_id int, lat double, lon double")
    s = spark.createDataFrame(
        [("overpole", 85.0, 180.0), ("far", 60.0, 90.0)],
        "POS_NM string, LTT double, LGT double",
    )
    got = bucketed_knn(q, s, radius_m=2_000_000, k=3, max_abs_lat_deg=85.0).collect()
    assert [r.POS_NM for r in got] == ["overpole"]


def test_bucketed_knn_antimeridian_wraparound(spark):
    q = spark.createDataFrame([(1, 0.0, 179.5)], "query_id int, lat double, lon double")
    s = spark.createDataFrame(
        [("wrap", 0.0, -179.5)], "POS_NM string, LTT double, LGT double"
    )
    got = bucketed_knn(q, s, radius_m=200_000, k=1).collect()
    assert [r.POS_NM for r in got] == ["wrap"]  # ~111 km across ±180°


def test_bucketed_knn_true_lon_span_at_high_latitude(spark):
    """lat 72°, radius 2000 km: the disk's true longitude span is
    ~88.2° ≈ 4.9 cells, so a query near its cell's east edge needs a
    5-cell probe — the planar 1/cos approximation gave only 4 and
    silently dropped this neighbor (1994 km away, 5 cells east)."""
    queries = spark.createDataFrame(
        [(1, 72.0, 17.9)], "query_id int, lat double, lon double"
    )
    stores = spark.createDataFrame(
        [("edge", 88.38, 102.9)], "POS_NM string, LTT double, LGT double"
    )
    got = bucketed_knn(
        queries, stores, radius_m=2_000_000, k=1, max_abs_lat_deg=72.0
    ).collect()
    assert [r.POS_NM for r in got] == ["edge"]


def test_haversine_antipodes_not_nan(spark):
    import math

    df = spark.createDataFrame([(30.0, 10.0, -30.0, -170.0)],
                               "lat1 double, lon1 double, lat2 double, lon2 double")
    d = df.select(haversine_meters("lat1", "lon1", "lat2", "lon2").alias("d")).first().d
    assert d == d  # not NaN
    assert abs(d - math.pi * EARTH_RADIUS_M) < 1000  # half circumference


# -- WGS-84 geodesic (J3 exact-parity path) ---------------------------------

def test_vincenty_known_ellipsoid_arcs():
    """Public WGS-84 constants: 1° of longitude along the equator is
    a·π/180 = 111319.491 m exactly (equatorial arc); 1° of latitude
    from the equator is ≈110574.4 m (meridional arc)."""
    from gpi_etl_spark.functions.geo import _vincenty_inverse

    d_lon = _vincenty_inverse([0.0], [0.0], [0.0], [1.0])[0]
    assert abs(d_lon - 111319.491) < 0.01
    d_lat = _vincenty_inverse([0.0], [0.0], [1.0], [0.0])[0]
    assert abs(d_lat - 110574.4) < 5.0
    # symmetric, zero at coincident points
    assert _vincenty_inverse([14.5], [-90.6], [14.5], [-90.6])[0] == 0.0
    a = _vincenty_inverse([14.497], [-90.59], [15.5], [-88.0])[0]
    b = _vincenty_inverse([15.5], [-88.0], [14.497], [-90.59])[0]
    assert abs(a - b) < 1e-6


def test_vincenty_antipodal_band():
    """The non-convergent ±0.5° antipodal band resolves via the
    direct-problem shooting fallback, not Haversine:

    * the classic antipodal inverse example (0,0)→(0.5,179.5) is
      19 936 288.579 m (GeographicLib's documented value) — matched to
      centimeters;
    * the exactly-antipodal equatorial pair takes the over-the-pole
      geodesic (≈ half the meridian ellipse, 20 003 931.46 m), NOT the
      longer equatorial path π·a = 20 037 508 m;
    * a grid across the band yields finite values in the geodesic
      range.
    """
    import numpy as np

    from gpi_etl_spark.functions.geo import _vincenty_inverse

    d = _vincenty_inverse([0.0], [0.0], [0.5], [179.5])[0]
    assert abs(d - 19936288.579) < 0.05
    d_eq = _vincenty_inverse([0.0], [0.0], [0.0], [180.0])[0]
    assert abs(d_eq - 20003931.46) < 50.0
    d_pole = _vincenty_inverse([90.0], [0.0], [-90.0], [0.0])[0]
    assert abs(d_pole - 20003931.46) < 50.0
    lats = np.linspace(-0.5, 0.5, 5)
    lons = np.full_like(lats, 179.7)
    ds = _vincenty_inverse(np.zeros_like(lats), np.zeros_like(lats), lats, lons)
    assert np.isfinite(ds).all()
    assert ((ds > 1.99e7) & (ds < 2.005e7)).all()


def test_geodesic_vs_haversine_delta_at_reference_coords(spark):
    """At the reference's own coordinates (Guatemala City POIs,
    HTIPPLSITE/__init__.py:380) the sphere-vs-ellipsoid drift peaks
    at ~0.56% for meridional legs; the geodesic pandas_udf must sit
    inside that documented bound."""
    from gpi_etl_spark.functions.geo import geodesic_meters

    rows = [
        (14.4970899, -90.5900806, 14.5063, -90.5852),   # ~1 km city hop
        (14.4970899, -90.5900806, 15.7835, -88.7832),   # ~230 km cross-country
        (9.93, -84.08, 9.9305, -84.0803),               # the test-site block
    ]
    df = spark.createDataFrame(
        rows, "lat1 double, lon1 double, lat2 double, lon2 double"
    )
    out = df.select(
        geodesic_meters("lat1", "lon1", "lat2", "lon2").alias("geo"),
        haversine_meters("lat1", "lon1", "lat2", "lon2").alias("hav"),
    ).collect()
    for r in out:
        assert r.geo > 0
        assert abs(r.geo - r.hav) / r.geo < 0.006


def test_poi_features_geodesic_mode(spark):
    from gpi_etl_spark.plans import sites
    from gpi_etl_spark.schemas import POIS

    pois = spark.createDataFrame(
        [("N1", 9.93, -84.08, "p1", "BANCO NACIONAL", "BANK", 9.9305, -84.08)],
        POIS,
    )
    hav = sites.poi_features(sites.classify_pois(pois), categories=["BANCO"])
    geo = sites.poi_features(
        sites.classify_pois(pois), categories=["BANCO"], distance="geodesic"
    )
    d_h = hav.first().GEO_BANCO_MIN_DIST
    d_g = geo.first().GEO_BANCO_MIN_DIST
    assert d_g > 0 and abs(d_g - d_h) / d_g < 0.006


def test_point_in_polygon_unit_square(spark):
    from pyspark.sql import functions as F

    from gpi_etl_spark.functions.geo import point_in_polygon

    # tilted square (no horizontal edges): (0,-1),(1,0),(0,1),(-1,0)
    poly = [(0.0, -1.0), (1.0, 0.0), (0.0, 1.0), (-1.0, 0.0)]
    pts = [
        (1, 0.0, 0.0, True),      # center
        (2, 0.9, 0.15, False),    # |lat|+|lon| = 1.05 > 1: outside
        (3, 0.25, 0.25, True),
        (4, 2.0, 0.0, False),     # far outside
        (5, 0.0, -0.99, True),    # just inside the left vertex
        (6, -0.5, 0.51, False),   # outside the lower-right edge
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in pts], "id long, lat double, lon double"
    )
    got = {
        r.id: r.inside
        for r in df.select(
            "id", point_in_polygon("lat", "lon", poly).alias("inside")
        ).collect()
    }
    for i, _, _, want in pts:
        assert got[i] == want, i


def test_point_in_polygon_concave(spark):
    from gpi_etl_spark.functions.geo import point_in_polygon

    # concave "arrowhead": the notch point is OUTSIDE
    poly = [(0.0, 0.0), (4.0, 2.0), (1.0, 1.0), (4.02, -2.0)]
    pts = [
        (1, 3.0, 0.0, False),   # inside the notch: outside the polygon
        (2, 2.0, 1.2, True),    # right prong interior
        (3, 3.0, -1.0, True),   # left prong interior
    ]
    df = spark.createDataFrame(
        [(i, la, lo) for i, la, lo, _ in pts], "id long, lat double, lon double"
    )
    got = {
        r.id: r.inside
        for r in df.select(
            "id", point_in_polygon("lat", "lon", poly).alias("inside")
        ).collect()
    }
    for i, _, _, want in pts:
        assert got[i] == want, i
