"""Geodesic helpers as native column expressions.

Reference computes point-to-point distance with geopy's WGS-84 geodesic
inside an iterrows loop (HTIPPLSITE/__init__.py:318-322) and with SQL
Server ``geography::Point(..).STDistance`` (HTIPPLSITE/__init__.py:114).
Here it is a single Haversine column expression: fully codegen'd,
vectorized, shuffle-free — the right primitive at 100 TB. Haversine
(sphere, R=6371008.8 m mean Earth radius) differs from the ellipsoid by
<0.6% (worst on meridional legs); callers that need ellipsoid parity can wrap geopy in a pandas_udf
(see operators/geo_knn), but nothing in the engine's own surface does.
"""

from __future__ import annotations

import pandas as pd

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


# -- WGS-84 ellipsoid (geopy parity) ----------------------------------------

WGS84_A = 6378137.0                 # semi-major axis (m)
WGS84_F = 1.0 / 298.257223563      # flattening
WGS84_B = WGS84_A * (1.0 - WGS84_F)


def _vincenty_inverse(lat1, lon1, lat2, lon2):
    """Vectorized Vincenty inverse on the WGS-84 ellipsoid (numpy
    arrays in degrees → meters). Pure numpy so the pandas_udf below
    needs no geo library; accuracy vs geopy's Karney geodesic is
    sub-millimeter except within ~0.5° of the antipode, where Vincenty
    may not converge and the result falls back to Haversine.
    """
    import numpy as np

    lat1, lon1, lat2, lon2 = (np.asarray(x, dtype=float)
                              for x in (lat1, lon1, lat2, lon2))
    phi1, phi2 = np.radians(lat1), np.radians(lat2)
    L = np.radians(lon2 - lon1)
    U1, U2 = (np.arctan((1 - WGS84_F) * np.tan(p)) for p in (phi1, phi2))
    sinU1, cosU1, sinU2, cosU2 = np.sin(U1), np.cos(U1), np.sin(U2), np.cos(U2)

    lam = L.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos_sq_alpha = np.ones_like(lam)
    cos_2sm = np.zeros_like(lam)
    for _ in range(100):
        sin_lam, cos_lam = np.sin(lam), np.cos(lam)
        sin_sigma = np.sqrt(
            (cosU2 * sin_lam) ** 2
            + (cosU1 * sinU2 - sinU1 * cosU2 * cos_lam) ** 2
        )
        cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
        sigma = np.arctan2(sin_sigma, cos_sigma)
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(
                sin_sigma != 0, cosU1 * cosU2 * sin_lam / np.where(
                    sin_sigma == 0, 1.0, sin_sigma), 0.0
            )
        cos_sq_alpha = 1.0 - sin_alpha ** 2
        with np.errstate(divide="ignore", invalid="ignore"):
            cos_2sm = np.where(
                cos_sq_alpha != 0,
                cos_sigma - 2 * sinU1 * sinU2 / np.where(
                    cos_sq_alpha == 0, 1.0, cos_sq_alpha),
                0.0,  # equatorial line
            )
        C = WGS84_F / 16 * cos_sq_alpha * (4 + WGS84_F * (4 - 3 * cos_sq_alpha))
        lam_new = L + (1 - C) * WGS84_F * sin_alpha * (
            sigma + C * sin_sigma * (
                cos_2sm + C * cos_sigma * (-1 + 2 * cos_2sm ** 2))
        )
        converged = np.abs(lam_new - lam) < 1e-12
        lam = lam_new
        if converged.all():
            break

    u_sq = cos_sq_alpha * (WGS84_A ** 2 - WGS84_B ** 2) / WGS84_B ** 2
    A = 1 + u_sq / 16384 * (4096 + u_sq * (-768 + u_sq * (320 - 175 * u_sq)))
    B = u_sq / 1024 * (256 + u_sq * (-128 + u_sq * (74 - 47 * u_sq)))
    dsigma = B * sin_sigma * (
        cos_2sm + B / 4 * (
            cos_sigma * (-1 + 2 * cos_2sm ** 2)
            - B / 6 * cos_2sm * (-3 + 4 * sin_sigma ** 2)
            * (-3 + 4 * cos_2sm ** 2)
        )
    )
    dist = WGS84_B * A * (sigma - dsigma)

    # coincident points → 0; non-converged (near-antipodal ±0.5° band)
    # → solve the inverse by SHOOTING the always-convergent direct
    # problem with 2-D Newton (_antipodal_inverse) — near-exact (tested
    # to ~2e-5 m on the classic antipodal example), vs the ~tens-of-km
    # error a spherical or Lambert fallback carries in this band
    coincident = (np.abs(lat1 - lat2) < 1e-12) & (np.abs(lon1 - lon2) < 1e-12)
    if not converged.all():
        b1, b2, b3, b4 = np.broadcast_arrays(lat1, lon1, lat2, lon2)
        idx = np.flatnonzero(~converged)
        fixed = np.array([
            _antipodal_inverse(
                float(b1.flat[i]), float(b2.flat[i]),
                float(b3.flat[i]), float(b4.flat[i]),
            )
            for i in idx
        ])
        dist = dist.copy()
        dist.flat[idx] = fixed
    return np.where(coincident, 0.0, dist)


def _vincenty_direct(lat1: float, lon1: float, alpha1: float, s: float):
    """Vincenty DIRECT problem (always convergent): start point +
    azimuth + distance → end point, scalar numpy."""
    import numpy as np

    phi1 = np.radians(lat1)
    U1 = np.arctan((1 - WGS84_F) * np.tan(phi1))
    sigma1 = np.arctan2(np.tan(U1), np.cos(alpha1))
    sin_alpha = np.cos(U1) * np.sin(alpha1)
    cos2_alpha = 1 - sin_alpha ** 2
    u2 = cos2_alpha * (WGS84_A ** 2 - WGS84_B ** 2) / WGS84_B ** 2
    A = 1 + u2 / 16384 * (4096 + u2 * (-768 + u2 * (320 - 175 * u2)))
    Bc = u2 / 1024 * (256 + u2 * (-128 + u2 * (74 - 47 * u2)))
    sigma = s / (WGS84_B * A)
    for _ in range(200):
        two_sm = 2 * sigma1 + sigma
        dsig = Bc * np.sin(sigma) * (
            np.cos(two_sm) + Bc / 4 * (
                np.cos(sigma) * (-1 + 2 * np.cos(two_sm) ** 2)
                - Bc / 6 * np.cos(two_sm) * (-3 + 4 * np.sin(sigma) ** 2)
                * (-3 + 4 * np.cos(two_sm) ** 2)
            )
        )
        new = s / (WGS84_B * A) + dsig
        if abs(new - sigma) < 1e-14:
            sigma = new
            break
        sigma = new
    ss, cs = np.sin(sigma), np.cos(sigma)
    sU1, cU1 = np.sin(U1), np.cos(U1)
    ca1 = np.cos(alpha1)
    phi2 = np.arctan2(
        sU1 * cs + cU1 * ss * ca1,
        (1 - WGS84_F) * np.sqrt(
            sin_alpha ** 2 + (sU1 * ss - cU1 * cs * ca1) ** 2
        ),
    )
    lam = np.arctan2(ss * np.sin(alpha1), cU1 * cs - sU1 * ss * ca1)
    C = WGS84_F / 16 * cos2_alpha * (4 + WGS84_F * (4 - 3 * cos2_alpha))
    two_sm = 2 * sigma1 + sigma
    L = lam - (1 - C) * WGS84_F * sin_alpha * (
        sigma + C * ss * (np.cos(two_sm) + C * cs * (-1 + 2 * np.cos(two_sm) ** 2))
    )
    return float(np.degrees(phi2)), float(lon1 + np.degrees(L))


def _antipodal_inverse(lat1: float, lon1: float, lat2: float, lon2: float) -> float:
    """Geodesic distance where Vincenty's inverse won't converge
    (within ~0.5° of the antipode): 2-D Newton on (azimuth, distance)
    against the direct problem, from several azimuth starts (antipodal
    pairs have many stationary paths — keep the SHORTEST that lands on
    the target). Haversine only as the last resort."""
    import numpy as np

    p1, p2 = np.radians(lat1), np.radians(lat2)
    dl = np.radians(lon2 - lon1)
    a = (np.sin((p2 - p1) / 2) ** 2
         + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2)
    s0 = 2 * EARTH_RADIUS_M * float(np.arcsin(min(np.sqrt(a), 1.0)))
    az0 = float(np.arctan2(
        np.sin(dl) * np.cos(p2),
        np.cos(p1) * np.sin(p2) - np.sin(p1) * np.cos(p2) * np.cos(dl),
    ))
    best = None
    # spherical azimuth + near-meridional starts: the equatorial
    # near-antipodal geodesic flees toward a pole, which the spherical
    # initial guess (due east/west) cannot see
    for az_init in (az0, 0.05 * np.pi, 0.95 * np.pi, -0.05 * np.pi, -0.95 * np.pi):
        x = np.array([az_init, s0])
        ok = False
        for _ in range(50):
            la, lo = _vincenty_direct(lat1, lon1, x[0], x[1])
            r = np.array([lat2 - la, (lon2 - lo + 180.0) % 360.0 - 180.0])
            if np.abs(r).max() < 1e-10:
                ok = True
                break
            J = np.zeros((2, 2))
            for j, h in enumerate((1e-7, 1.0)):
                xp = x.copy()
                xp[j] += h
                la2, lo2 = _vincenty_direct(lat1, lon1, xp[0], xp[1])
                J[0, j] = (la2 - la) / h
                J[1, j] = ((lo2 - lo + 180.0) % 360.0 - 180.0) / h
            try:
                step = np.linalg.solve(J, r)
            except np.linalg.LinAlgError:
                break
            x = x + step
            if not np.isfinite(x).all() or x[1] <= 0 or x[1] > 2.1e7:
                break
        if ok and (best is None or x[1] < best):
            best = float(x[1])
    return best if best is not None else s0


def geodesic_meters(
    lat1: Column | str,
    lon1: Column | str,
    lat2: Column | str,
    lon2: Column | str,
) -> Column:
    """WGS-84 ellipsoid distance as an Arrow-batched pandas_udf — the
    exact-parity path for the reference's ``geopy.distance.geodesic``
    loop (HTIPPLSITE/__init__.py:318-322). Uses geopy when installed
    (Karney), else the built-in vectorized Vincenty (sub-mm agreement
    away from the antipode). Prefer :func:`haversine_meters` (<0.6%
    drift, fully codegen'd) unless ellipsoid exactness matters."""
    from pyspark.sql import types as T

    try:
        from geopy.distance import geodesic as _geopy_geodesic
    except ImportError:
        _geopy_geodesic = None

    @F.pandas_udf(T.DoubleType())
    def _dist(a: pd.Series, b: pd.Series, c: pd.Series, d: pd.Series) -> pd.Series:
        if _geopy_geodesic is not None:
            return pd.Series([
                _geopy_geodesic((la, lo), (lb, lp)).meters
                for la, lo, lb, lp in zip(a, b, c, d)
            ], index=a.index, dtype=float)
        return pd.Series(
            _vincenty_inverse(a.to_numpy(), b.to_numpy(),
                              c.to_numpy(), d.to_numpy()),
            index=a.index, dtype=float,
        )

    cols = [F.col(c) if isinstance(c, str) else c
            for c in (lat1, lon1, lat2, lon2)]
    return _dist(*cols)


def point_in_polygon(
    lat, lon, vertices: list[tuple[float, float]]
):
    """Ray-casting point-in-polygon test against a FIXED polygon
    (geofence membership — "which stores sit inside the delivery
    region"): cast a ray along +longitude and count edge crossings;
    odd = inside. The polygon is compile-time constant, so the test
    unrolls to one arithmetic term per edge — pure codegen'd doubles,
    no UDF, no trig — and the identical expression replays in SQL
    (:func:`point_in_polygon_sql`). Boundary points follow the
    half-open crossing rule; supply vertices off the data grid if
    exact-boundary determinism matters. Horizontal edges contribute
    no crossing (the strict/non-strict pair excludes them before the
    slope division).

    ``vertices``: [(lat, lon), ...] in order (either winding); the
    closing edge back to the first vertex is implicit.
    """
    from pyspark.sql import functions as F

    la = F.col(lat) if isinstance(lat, str) else lat
    lo = F.col(lon) if isinstance(lon, str) else lon
    n = len(vertices)
    crossings = F.lit(0)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        cond = (
            (F.lit(float(y1)) > la) != (F.lit(float(y2)) > la)
        ) & (
            lo
            < (F.lit(float(x2)) - F.lit(float(x1)))
            * (la - F.lit(float(y1)))
            / (F.lit(float(y2)) - F.lit(float(y1)))
            + F.lit(float(x1))
        )
        crossings = crossings + F.when(cond, 1).otherwise(0)
    return crossings % 2 == 1


def point_in_polygon_sql(
    lat_expr: str, lon_expr: str, vertices: list[tuple[float, float]]
) -> str:
    """DuckDB/ANSI spelling of :func:`point_in_polygon` — the same
    unrolled crossing terms, summed, parity-tested.

    Vertex literals are emitted as explicit ``CAST(… AS DOUBLE)``: a
    bare numeric literal parses as DECIMAL in DuckDB, which would
    evaluate terms like ``(x2 - x1)`` exactly in decimal before
    coercing to double — NOT the IEEE-double chain Spark computes, and
    this expression feeds a strict ``<`` with no output rounding, so a
    1-ULP divergence could flip inside/outside for a point sitting on
    an edge. With the casts both engines run the identical double
    arithmetic."""
    n = len(vertices)

    def d(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    terms = []
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({d(y1)} > {lat_expr}) <> ({d(y2)} > {lat_expr}))"
            f" AND {lon_expr} < ({d(x2)} - {d(x1)})"
            f" * ({lat_expr} - {d(y1)}) / ({d(y2)} - {d(y1)}) + {d(x1)}"
            f" THEN 1 ELSE 0 END)"
        )
    return "((" + " + ".join(terms) + ") % 2 = 1)"
