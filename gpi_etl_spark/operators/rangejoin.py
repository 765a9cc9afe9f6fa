"""Banded range (interval) join — the scale path for theta joins.

The reference's only non-equi join is the geo knn pushed to SQL Server
(``HTIPPLSITE/__init__.py:105-121``); the general shape — "match rows
whose timestamp falls inside another row's interval" — has no equi key,
so a naive Spark plan is a broadcast-nested-loop cross join: O(N×M)
comparisons that will not survive 100 TB.

``band_range_join`` turns it into an equi-join: both sides are hashed
onto fixed-width time bands (``band_seconds``). A point lands in
exactly one band; an interval is exploded across every band it
overlaps. Joining on (optional equi keys ++ band) then re-applying the
exact predicate gives identical semantics with shuffle-partitionable
keys. Each point appears in one band, so no dedup is needed.

Cost model: interval fan-out = ceil(interval_len / band) + 1, so pick
``band_seconds`` ≈ the typical interval length — fan-out stays ~2 while
each band's candidate set shrinks by N/bands.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BAND = "__band"


def band_range_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str,
    end_col: str,
    ts_col: str,
    band_seconds: int,
    keys: Sequence[str] = (),
    how: str = "inner",
) -> DataFrame:
    """Join each interval ``[start_col, end_col)`` to the points whose
    ``ts_col`` falls inside it (half-open), banding both sides so the
    physical plan is a shuffled/broadcast equi-join instead of a
    nested-loop cross join.

    ``keys`` are extra equi-join columns present on BOTH sides (e.g. a
    user id); they tighten the bands further and must not collide with
    other column names. All other column names must be disjoint between
    the two inputs (alias before calling).

    ``how='inner'`` keeps only matched (interval, point) rows;
    ``how='left'`` keeps unmatched intervals with null point columns
    (implemented as inner + anti-union so the banding stays an
    equi-join on both branches).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    def band_of(col: str) -> F.Column:
        # floor (not int-cast) so pre-1970 timestamps band correctly
        return F.floor(F.unix_timestamp(F.col(col)) / band_seconds).cast("long")

    i_band = F.explode(F.sequence(band_of(start_col), band_of(end_col))).alias(BAND)
    p_band = band_of(ts_col)

    lhs = intervals.select("*", i_band)
    rhs = points.withColumn(BAND, p_band)
    cond = [*keys, BAND]
    matched = (
        lhs.join(rhs, cond)
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop(BAND)
    )
    if how == "inner":
        return matched
    point_cols = [c for c in points.columns if c not in keys]
    # null-safe anti-join: plain column equality is null-unsafe, so an
    # interval carrying a NULL attribute would never equal itself and
    # be emitted twice (matched AND null-padded). eqNullSafe per column
    # keeps NULL-attributed matched intervals out of the unmatched branch.
    iv = intervals.alias("__iv")
    mt = matched.select(*intervals.columns).alias("__mt")
    anti_cond = reduce(
        lambda a, b: a & b, [iv[c].eqNullSafe(mt[c]) for c in intervals.columns]
    )
    unmatched = iv.join(mt, anti_cond, "left_anti").select(
        "*", *[F.lit(None).alias(c) for c in point_cols]
    )
    return matched.unionByName(unmatched)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_cols: tuple[str, str],
    r_cols: tuple[str, str],
    l_id: Sequence[str],
    r_id: Sequence[str],
    band_us: int,
) -> DataFrame:
    """TWO-SIDED interval overlap join: every (left, right) pair whose
    half-open microsecond intervals intersect (``ls < re AND rs < le``)
    — the generalization of :func:`band_range_join` where BOTH sides
    are intervals (sessions × incident windows, trades × halts).

    Both sides explode onto the fixed ``band_us`` grid cells they
    touch; overlapping pairs always share the cell containing their
    intersection's start, so an equi-join on the cell finds every true
    pair, the exact predicate discards same-cell non-overlaps, and a
    ``dropDuplicates`` on the id columns collapses pairs that share
    several cells. Fan-out per row = interval_len/band + 1: pick the
    band near the typical interval length and the plan is a plain
    shuffled equi-join — no nested loop at any scale.

    Column names must be disjoint between the two inputs.
    """
    ls, le = (F.col(c) for c in l_cols)
    rs, re_ = (F.col(c) for c in r_cols)
    # zero/negative-length intervals are mathematically empty — drop
    # them before banding (a descending F.sequence would otherwise
    # fabricate cells for them; the sweep-line sibling applies the
    # same e > s guard)
    left = left.filter(le > ls)
    right = right.filter(re_ > rs)
    # integer `div`, not float floor: epoch-microsecond magnitudes sit
    # close enough to the double rounding edge that exactness should
    # not depend on an error analysis
    lb = left.withColumn(
        BAND,
        F.explode(
            F.sequence(
                F.expr(f"{l_cols[0]} div {band_us}"),
                F.expr(f"({l_cols[1]} - 1) div {band_us}"),
            )
        ),
    )
    rb = right.withColumn(
        BAND,
        F.explode(
            F.sequence(
                F.expr(f"{r_cols[0]} div {band_us}"),
                F.expr(f"({r_cols[1]} - 1) div {band_us}"),
            )
        ),
    )
    return (
        lb.join(rb, BAND)
        .filter((ls < re_) & (rs < le))
        .dropDuplicates([*l_id, *r_id])
        .drop(BAND)
    )
