"""Data-quality constraint checking: declarative rules → one-pass report.

The reference validates nothing (SURVEY §5 — its only guards are
``data.empty`` checks and an existence probe, P12/S-sites). A 100 TB
ingest needs contract enforcement at the boundary: this module turns a
rule list into ONE aggregate pass over the table (every rule becomes a
conditional count in the same projection — no per-rule scans), plus an
optional referential check that compiles to a broadcast anti-join
count. Fail-closed semantics: a rule whose predicate evaluates to NULL
on a row counts that row as failing (unknown ≠ pass), so nullable
columns must be handled explicitly in the predicate (`x IS NULL OR …`
to allow nulls).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


from gpi_etl_spark.functions.rounding import fs6 as _fs6  # noqa: E402



@dataclass(frozen=True)
class Check:
    """One constraint: ``name`` labels the report row; ``predicate`` is
    a SQL boolean expression over the table's columns — TRUE passes."""

    name: str
    predicate: str


def quality_report(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate all checks in one scan.

    Returns one row per check: (check_name, n_rows, n_fail, fail_rate 6dp).
    All conditional counts ride the same partial-aggregate, so the cost
    is one table pass regardless of how many rules run.
    """
    if not checks:  # an empty contract is an empty report, not a crash
        return df.sparkSession.createDataFrame(
            [], "check_name string, n_rows bigint, n_fail bigint, fail_rate double"
        )
    # internal positional aliases keep arbitrary check names (spaces,
    # quotes, reserved words, 'n_rows') out of the identifier namespace;
    # the display name appears only as an escaped string literal
    n_rows = F.count(F.lit(1)).alias("__n_rows")
    fails = [
        F.sum(F.when(F.expr(c.predicate), 0).otherwise(1)).alias(f"__chk{i}")
        for i, c in enumerate(checks)
    ]
    wide = df.agg(n_rows, *fails)
    pairs = ", ".join(
        "'{name}', __chk{i}".format(name=c.name.replace("'", "''"), i=i)
        for i, c in enumerate(checks)
    )
    stacked = wide.select(
        F.col("__n_rows").alias("n_rows"),
        F.expr(f"stack({len(checks)}, {pairs}) as (check_name, n_fail)"),
    )
    return stacked.select(
        "check_name",
        "n_rows",
        "n_fail",
        _fs6(F.col("n_fail") / F.col("n_rows")).alias("fail_rate"),
    )


def referential_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
    name: str = "referential",
) -> DataFrame:
    """Orphan count: child rows whose key has no parent (left anti join
    — broadcast when the parent's distinct keys are small, shuffle-hash
    otherwise; AQE decides). Same report schema as
    :func:`quality_report`, so the two union into one report. Fully
    lazy — both counts are aggregates in the plan, no driver action."""
    total = child.agg(F.count(F.lit(1)).alias("n_rows"))
    orphans = (
        child.select(F.col(child_key))
        .join(
            parent.select(F.col(parent_key).alias(child_key)).distinct(),
            child_key,
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_fail"))
    )
    return total.crossJoin(orphans).select(
        F.lit(name).alias("check_name"),
        "n_rows",
        "n_fail",
        _fs6(F.col("n_fail") / F.col("n_rows")).alias("fail_rate"),
    )


def histogram(
    df: DataFrame,
    col: str,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width numeric histogram — the column-profiling primitive a
    quality report attaches to every numeric column (distribution
    drift between corpus releases shows up here first).

    Unless pinned by the caller, ``lo``/``hi`` come from one min/max
    aggregate (two scalars to the driver — bounded model state, like
    the k-means centroids); the binning pass itself is a pure
    projection + groupBy, exact integer counts, map-side combinable.
    The top edge closes the last bin (``x = hi`` lands in bin
    ``bins-1``), NULLs and NaNs are excluded, and empty inputs return
    an empty frame.

    Returns ``(bin, lo_edge, hi_edge, n)`` for non-empty bins, with
    edges rounded to 6 dp.
    """
    x = F.col(col).cast("double")
    src = df.filter(x.isNotNull() & ~F.isnan(x))
    if lo is None or hi is None:
        row = src.agg(
            F.min(x).alias("lo"), F.max(x).alias("hi")
        ).collect()[0]
        if row["lo"] is None:
            return df.sparkSession.createDataFrame(
                [], "bin int, lo_edge double, hi_edge double, n bigint"
            )
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    # top-edge rule: an IN-RANGE value (x <= hi) whose computed index
    # reaches `bins` — the exact top edge, or a value so close to hi
    # that (x-lo)/width rounds up to bins (hypothesis found
    # lo=-1, hi=2.2e-313: x=0 lands EXACTLY on bins) — closes into the
    # last bin. Values beyond a pinned hi keep their overflowed index
    # and are dropped by the range filter (a blanket clamp would
    # silently absorb outliers). Degenerate hi == lo (constant column)
    # keeps everything in bin 0, unit width.
    width = (hi - lo) / bins if hi > lo else 1.0
    # bin index stays BIGINT until after the range filter: an extreme
    # outlier beyond a pinned range can overflow int32 and wrap back
    # into a valid bin (floor(2^32.5) -> int 0), silently counting an
    # out-of-range value
    b_raw = F.floor((x - F.lit(lo)) / F.lit(width))
    b = F.when(
        (b_raw >= bins) & (x <= F.lit(hi)), F.lit(bins - 1).cast("bigint")
    ).otherwise(b_raw)
    return (
        src.select(b.alias("bin"))
        .filter(F.col("bin").between(0, bins - 1))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("bin").cast("int").alias("bin"),
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias(
                "lo_edge"
            ),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias(
                "hi_edge"
            ),
            "n",
        )
    )


def mad_outliers(
    df: DataFrame,
    group_col: str,
    val_col: str,
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier flagging: a value is an outlier when
    ``|x - median| > k · MAD`` (median absolute deviation). Unlike
    mean/stddev z-scores, the median/MAD pair doesn't let the outliers
    themselves inflate the threshold — the standard robust screen a
    quality report runs before trusting a numeric column.

    Two grouped EXACT percentiles (same engine-parity contract as
    q107: Spark ``percentile`` ≡ DuckDB ``quantile_cont``) with a join
    back between them; group medians are |groups|-sized so AQE
    broadcasts the joins. At 100 TB swap the exact percentile for a
    quantile sketch (percentile_approx) and keep this as the auditor.

    Returns the input plus ``_med``, ``_mad``, ``is_outlier``.
    """
    x = F.col(val_col).cast("double")
    med = df.groupBy(group_col).agg(
        F.percentile(x, 0.5).alias("_med")
    )
    j = df.join(med, group_col)
    mad = j.groupBy(group_col).agg(
        F.percentile(F.abs(x - F.col("_med")), 0.5).alias("_mad")
    )
    return j.join(mad, group_col).withColumn(
        "is_outlier",
        F.abs(x - F.col("_med")) > F.lit(float(k)) * F.col("_mad"),
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    bins: int = 10,
    width: float = 100.0,
) -> DataFrame:
    """Population Stability Index between two releases of a numeric
    signal — the release-over-release drift monitor (PSI < 0.1 stable,
    0.1–0.25 shifting, > 0.25 investigate): per fixed-width bin,
    ``contrib = (q - p) · ln(q/p)`` with add-one-smoothed shares, and
    ``PSI = Σ contrib``. Fixed data-independent bins (clamped to
    ``[0, bins)``) keep the comparison stable across releases and
    engines — unlike auto-ranged histograms, whose edges move with the
    data they're supposed to monitor.

    Two grouped counts + a bin spine join; the two scalar totals ride
    a one-row broadcast (the scalar-subquery pattern). NULL/NaN values
    are EXCLUDED from both the bins and the totals (least/greatest
    skip NULLs in both engines, so without the explicit filter a NULL
    signal would silently land in the top bin and masquerade as
    high-value drift — monitor NULL-rate drift as its own check).

    Returns one row per bin: ``(bin, n_old, n_new, contrib_r)``.
    """
    def clean(df: DataFrame) -> DataFrame:
        x = F.col(value_col)
        return df.filter(x.isNotNull() & ~F.isnan(x.cast("double")))

    old, new = clean(old), clean(new)

    def binned(df: DataFrame) -> DataFrame:
        b = F.greatest(
            F.lit(0),
            F.least(
                F.lit(bins - 1),
                F.floor(F.col(value_col) / F.lit(float(width))).cast(
                    "int"
                ),
            ),
        )
        return df.select(b.alias("bin")).groupBy("bin").agg(
            F.count(F.lit(1)).alias("c")
        )

    oc = binned(old).withColumnRenamed("c", "_co")
    nc = binned(new).withColumnRenamed("c", "_cn")
    spine = old.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin")
    )
    totals = (
        old.agg(F.count(F.lit(1)).alias("_no"))
        .crossJoin(new.agg(F.count(F.lit(1)).alias("_nn")))
    )
    co = F.coalesce(F.col("_co"), F.lit(0))
    cn = F.coalesce(F.col("_cn"), F.lit(0))
    p = (co + 1) / (F.col("_no") + bins)
    q = (cn + 1) / (F.col("_nn") + bins)
    return (
        spine.join(oc, "bin", "left")
        .join(nc, "bin", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bin",
            co.cast("bigint").alias("n_old"),
            cn.cast("bigint").alias("n_new"),
            F.round((q - p) * F.log(q / p), 6).alias("contrib_r"),
        )
    )


def ab_conversion_ztest(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    variant_expr=None,
) -> DataFrame:
    """Two-proportion z-test on user-level conversion between two
    experiment arms — the experimentation readout every event
    warehouse serves. A user converts if they ever emitted
    ``convert_type``; arms come from ``variant_expr`` (default:
    ``user_id % 2``, the hash-bucket assignment pattern —
    deterministic, so the test replays cross-engine).

    ``z = (p_a - p_b) / sqrt( p̂ (1-p̂) (1/n_a + 1/n_b) )`` with the
    pooled rate p̂. One groupBy(user) + one tiny aggregate; the whole
    readout is a two-row shuffle regardless of event volume.

    Returns one row: ``(n_a, n_b, conv_a, conv_b, rate_a, rate_b,
    z_r)`` with rates/z rounded to 6 dp.
    """
    if variant_expr is None:
        # the parity default relies on numeric ids; a string id would
        # coerce to NULL and silently dump EVERY user into arm 'b' —
        # require an explicit assignment expression instead
        dt = dict(events.dtypes).get(user_col, "")
        if dt not in ("tinyint", "smallint", "int", "bigint"):
            raise ValueError(
                f"default variant assignment needs an integer {user_col!r} "
                f"(got {dt or 'missing column'}); pass variant_expr= for "
                "non-integer ids (e.g. a hash-bucket expression)"
            )
        variant_expr = F.col(user_col) % 2 == 0
    variant = variant_expr
    per_user = events.groupBy(user_col).agg(
        F.max(
            (F.col(type_col) == convert_type).cast("int")
        ).alias("_conv"),
    )
    arms = per_user.select(
        F.when(variant, F.lit("a")).otherwise(F.lit("b")).alias("_arm"),
        "_conv",
    )
    agg = arms.agg(
        F.sum(F.when(F.col("_arm") == "a", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_arm") == "b", 1).otherwise(0)).alias("n_b"),
        F.sum(
            F.when(F.col("_arm") == "a", F.col("_conv")).otherwise(0)
        ).alias("conv_a"),
        F.sum(
            F.when(F.col("_arm") == "b", F.col("_conv")).otherwise(0)
        ).alias("conv_b"),
    )
    # try_divide: an EMPTY arm yields NULL rates and a 0.0 z-statistic
    # instead of an ANSI divide-by-zero error — a half-configured
    # experiment should read out as "no signal", not crash the job
    p_a = F.try_divide(F.col("conv_a"), F.col("n_a"))
    p_b = F.try_divide(F.col("conv_b"), F.col("n_b"))
    pooled = F.try_divide(
        F.col("conv_a") + F.col("conv_b"), F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled
        * (1 - pooled)
        * (
            F.try_divide(F.lit(1), F.col("n_a"))
            + F.try_divide(F.lit(1), F.col("n_b"))
        )
    )
    return agg.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.col("conv_a").cast("bigint").alias("conv_a"),
        F.col("conv_b").cast("bigint").alias("conv_b"),
        _fs6(p_a).alias("rate_a"),
        _fs6(p_b).alias("rate_b"),
        F.round(
            F.when(se > 0, (p_a - p_b) / se).otherwise(F.lit(0.0)), 6
        ).alias("z_r"),
    )


def impute_median(
    df: DataFrame,
    group_col: str,
    val_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Group-median imputation: NULL values fill with the EXACT median
    of their group's non-null values (the robust default for skewed
    numeric columns — a mean would chase the outliers), plus a
    ``was_imputed`` audit flag so downstream consumers can weight or
    exclude filled rows. Groups that are entirely NULL stay NULL
    (imputing from nothing is a lie; surface it instead).

    One grouped percentile + one broadcastable join; same
    percentile-parity contract as q107/q142.
    """
    out_col = out_col or val_col
    x = F.col(val_col).cast("double")
    med = df.filter(x.isNotNull()).groupBy(group_col).agg(
        F.percentile(x, 0.5).alias("_gmed")
    )
    return (
        df.join(med, group_col, "left")
        .withColumn("was_imputed", x.isNull() & F.col("_gmed").isNotNull())
        .withColumn(out_col, F.coalesce(x, F.col("_gmed")))
        .withColumnRenamed("_gmed", "group_median")
    )


def fd_check(
    df: DataFrame, lhs: str, rhs: str, name: str | None = None
) -> DataFrame:
    """Functional-dependency probe: does ``lhs`` determine ``rhs``?
    Holds iff ``count_distinct(lhs) = count_distinct(lhs, rhs)`` — the
    schema-discovery primitive behind denormalization decisions,
    key-candidate detection and dirty-dimension alerts ("region is no
    longer determined by nation: someone double-mapped a key").

    One aggregate pass; both counts ride the same partial aggregation.
    At 100 TB swap in approx_count_distinct and treat equality within
    the sketch error as "probably holds, audit exactly on the sample".
    Returns one row: ``(fd, lhs_card, pair_card, holds)``.
    """
    label = name or f"{lhs} -> {rhs}"
    # NULL semantics: a NULL determinant row is excluded (a key can't
    # be NULL), but a NULL DEPENDENT is a real distinct value — pair
    # cardinality counts (lhs, rhs) STRUCTS, because Spark's bare
    # countDistinct(a, b) silently drops any tuple containing a NULL
    # and would report holds=True for the exact dirty-dimension case
    # ((1,'x') vs (1,NULL)) this probe exists to catch
    return df.filter(F.col(lhs).isNotNull()).agg(
        F.lit(label).alias("fd"),
        F.countDistinct(F.col(lhs)).alias("lhs_card"),
        F.countDistinct(F.struct(F.col(lhs), F.col(rhs))).alias(
            "pair_card"
        ),
    ).withColumn("holds", F.col("lhs_card") == F.col("pair_card"))


def weighted_median(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Exact per-group WEIGHTED median: the smallest value whose
    cumulative weight reaches half the group's total — the estimator
    quantity-weighted pricing and token-weighted document stats need
    where the plain median over-counts small rows.

    One RANGE-framed window per group: ``cum(v) = Σ weight of all rows
    with value ≤ v`` — RANGE (not ROWS) makes the running total a pure
    function of the VALUE, so tied values carry identical cumulative
    weights in every engine and partition order can't perturb the
    pick. The boundary test is exact integer cross-multiplication
    (``2·cum ≥ total``) over integer weights; no float thresholds.
    Shuffle: one, on the group key. Weights must be non-negative
    integers.

    Returns ``(group_col, wmedian)`` with the value column's type.
    """
    w = F.col(weight_col).cast("long")
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(value_col).asc())
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy(group_col)
    staged = (
        df.select(group_col, value_col, w.alias("_w"))
        .withColumn("_cum", F.sum("_w").over(cum_w))
        .withColumn("_tot", F.sum("_w").over(tot_w))
    )
    return (
        staged.filter(F.col("_cum") * 2 >= F.col("_tot"))
        .groupBy(group_col)
        .agg(F.min(value_col).alias("wmedian"))
    )


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> DataFrame:
    """Per-group winsorized summary: clamp ``value_col`` to the group's
    [p_lo, p_hi] percentiles, then aggregate — the robust
    pre-processing step that stops a handful of fat-finger outliers
    from dominating a mean (the alternative to dropping rows, which
    changes counts downstream).

    The clamp runs against FLOOR-SCALED (6-dp) boundaries, not raw
    percentiles: two engines interpolating the same percentile can
    differ in the last ulp, and clamping against ulp-different
    boundaries makes borderline rows clip differently — 6-dp-equal
    boundaries (the proven cross-engine class) make the clip a pure
    function of the data. Two shuffles: one group aggregate for the
    boundaries (broadcast back — group cardinality is small by
    construction), one re-aggregate of the clipped values.

    Returns ``(group_col, n, lo_r, hi_r, clipped_mean_r)``.
    """
    bounds = df.groupBy(group_col).agg(
        _fs6(F.percentile(value_col, F.lit(lo))).alias("lo_r"),
        _fs6(F.percentile(value_col, F.lit(hi))).alias("hi_r"),
    )
    joined = df.join(F.broadcast(bounds), group_col)
    clipped = F.greatest(
        F.col("lo_r"), F.least(F.col(value_col), F.col("hi_r"))
    )
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("lo_r").alias("lo_r"),
        F.max("hi_r").alias("hi_r"),
        # mean of possibly integer-valued data is the exact-rational
        # class -> floor-scaled, like the boundaries (review find)
        _fs6(F.avg(clipped)).alias("clipped_mean_r"),
    )


def key_skew_profile(df: DataFrame, key_col: str, label: str) -> DataFrame:
    """Join-key skew diagnostics — the measurement behind every
    salting/AQE decision: per-key multiplicities are collapsed to a
    frequency-of-frequencies histogram, and from it come the exact p50
    and p99 multiplicities, the hottest key's share, and the salt
    factor a shuffle on this key would need (``ceil(max_n / mean_n)``,
    integer ceiling — how many splits bring the hottest key down to
    the average partition load).

    Scale shape: one groupBy on the key (map-side combined counts),
    one aggregation of the count frame, one TINY global window over
    the frequency-of-frequencies histogram — bounded by the number of
    DISTINCT multiplICITY VALUES (an aggregate-of-an-aggregate; a
    billion-key table with multiplicities up to 10⁶ yields ≤ 10⁶
    histogram rows, usually a few hundred), never over rows or keys.
    All outputs are exact int64 except the skew ratio, which is the
    6-dp floor-scaled rational ``max_n·n_keys/n_rows`` (1.0 = uniform).
    """
    counts = df.groupBy(F.col(key_col).alias("_k")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    hist = counts.groupBy("_n").agg(F.count(F.lit(1)).alias("_freq"))
    w = Window.orderBy("_n").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("_cum", F.sum("_freq").over(w))
    stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_n").alias("n_rows"),
        F.max("_n").alias("max_n"),
    )
    # exact percentile of multiplicities: smallest n whose cumulative
    # key count reaches ceil(q * n_keys)
    pct = cum.crossJoin(F.broadcast(stats)).agg(
        F.min(
            F.when(
                F.col("_cum") * 2 >= F.col("n_keys"), F.col("_n")
            )
        ).alias("p50_n"),
        F.min(
            F.when(
                F.col("_cum") * 100 >= F.col("n_keys") * 99, F.col("_n")
            )
        ).alias("p99_n"),
    )
    return (
        stats.crossJoin(F.broadcast(pct))
        .select(
            F.lit(label).alias("key"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("n_keys").cast("long").alias("n_keys"),
            F.col("max_n").cast("long").alias("max_n"),
            F.col("p50_n").cast("long").alias("p50_n"),
            F.col("p99_n").cast("long").alias("p99_n"),
            _fs6(
                F.col("max_n") * F.col("n_keys")
                / F.col("n_rows").cast("double")
            ).alias("skew_ratio"),
            # integer ceiling via div — float division could land one
            # ulp under an exact integer quotient and truncate wrong
            F.expr(
                "(max_n * n_keys + n_rows - 1) div n_rows"
            ).cast("long").alias("salt_factor"),
        )
    )


def content_checksum(
    df: DataFrame,
    cols: "list[Column | str]",
    group_by: "tuple[str, ...]" = (),
) -> DataFrame:
    """Order-independent dataset content checksum — the 100 TB way to
    verify a sink roundtrip, a CDC replication, or a repartition
    without sorting anything: each row canonicalizes to one string,
    hashes through the cross-engine polynomial hash
    (functions/xhash.py), and two ORDER-FREE aggregates summarize the
    multiset — ``bit_xor`` of the row hashes (cheap, but a duplicated
    row PAIR cancels out) and the mod-P sum (catches what xor misses;
    decimal(38,0) accumulator, so no overflow until ~10²⁹ rows).
    Together with the row count, any single-row change flips at least
    one output. Identical content in any row order, any partitioning,
    either engine → identical checksums.

    Callers must pass engine-stable column renderings: ints, strings,
    decimals and epoch integers are safe; raw DOUBLE or TIMESTAMP
    stringification differs across engines — cast to decimal /
    ``unix_micros`` first. NULL encodes as chr(0), fields join on
    chr(31), so ('a', NULL) and ('a', '') stay distinct.
    """
    from gpi_etl_spark.functions.xhash import P, poly_hash

    canon = F.concat_ws(
        "\x1f",
        *[
            F.coalesce(
                (F.col(c) if isinstance(c, str) else c).cast("string"),
                F.lit("\x00"),
            )
            for c in cols
        ],
    )
    hashed = df.select(*group_by, poly_hash(canon).alias("_h"))
    grouped = hashed.groupBy(*group_by) if group_by else hashed.groupBy()
    return grouped.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor("_h").alias("xor_checksum"),
        F.pmod(F.sum(F.col("_h").cast("decimal(38,0)")), F.lit(P))
        .cast("long")
        .alias("sum_checksum"),
    )


#: Benford expected first-digit shares, floored to 6 dp at definition
#: time so both engines compare against the SAME 1e-6-grid constants
#: (log10(1+1/d) computed once in Python, not per-engine).
import math as _math

BENFORD_6DP = {
    d: _math.floor(_math.log10(1 + 1 / d) * 1_000_000 + 0.5) / 1_000_000
    for d in range(1, 10)
}


def benford_profile(
    df: DataFrame,
    amount_col: str,
    group_col: str,
) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the classic
    screen for fabricated or truncated numeric columns (real-world
    multiplicative amounts lean on small leading digits; synthetic or
    capped data shows up flat or spiked).

    The digit comes from the STRING of the decimal(18,2)-quantized
    amount (first ``[1-9]`` match), never from ``floor(log10(x))`` —
    log10 lands exactly on integers at powers of ten only up to float
    rounding, an engine-dependent boundary; decimal rendering is
    identical everywhere. Zero amounts carry no leading digit and are
    excluded. One groupBy on (group, digit); shares are exact-rational
    6-dp floors and the Benford constants are 6-dp literals baked at
    import, so the deviation column is the same double in any engine.

    Returns one row per (group, digit): count, observed share,
    expected share, and ``dev = fs6(share − benford)``.
    """
    digit = F.regexp_extract(
        F.col(amount_col).cast("decimal(18,2)").cast("string"),
        "([1-9])",
        1,
    )
    counts = (
        df.select(F.col(group_col).alias("g"), digit.alias("d"))
        .filter(F.col("d") != "")
        .groupBy("g", "d")
        .agg(F.count(F.lit(1)).alias("n_d"))
    )
    totals = counts.groupBy("g").agg(F.sum("n_d").alias("n"))
    bmap = F.create_map(
        *[
            x
            for dd, share in BENFORD_6DP.items()
            for x in (F.lit(str(dd)), F.lit(share))
        ]
    )
    return (
        counts.join(totals, "g")
        .select(
            F.col("g").alias(group_col),
            F.col("d").cast("int").alias("digit"),
            F.col("n_d").cast("long").alias("n_d"),
            _fs6(F.col("n_d") / F.col("n").cast("double")).alias("share"),
            F.element_at(bmap, F.col("d")).alias("benford"),
        )
        .withColumn(
            "dev",
            _fs6(F.col("share") - F.col("benford")),
        )
    )


def inclusion_profile(
    pairs: "list[tuple[str, DataFrame, str, DataFrame, str]]",
) -> DataFrame:
    """Inclusion-dependency discovery: for each candidate
    ``(name, child, child_col, parent, parent_col)`` measure how much
    of the child column's DISTINCT value set is contained in the
    parent's — the schema-profiling sweep that finds undeclared
    foreign keys (containment 1.0), near-FKs rotted by dirty rows
    (0.99…), and refutes false candidates, across a whole candidate
    lattice in one report. Complements :func:`referential_check`
    (row-level orphan RATE for one known FK) and :func:`fd_check`
    (within-table determinism): this is the cross-table DISCOVERY
    primitive (Bauckmann et al.'s SPIDER lineage; public method).

    Returns one row per pair: ``(pair, lhs_card, contained,
    containment_r, is_fk_candidate)`` — all counts exact int64, the
    ratio 6-dp floor-scaled, and the flag decided by INTEGER equality
    (contained == lhs_card), never a float threshold. NULLs are
    excluded from both sides (a NULL key asserts nothing about
    inclusion).

    Scale shape: per pair, one distinct on each column (map-side
    combined) and a semi-join keyed on the value — broadcast when the
    parent's distinct set is small, shuffle-hash otherwise (AQE
    decides). For very wide candidate lattices at 100 TB, pre-filter
    with the replayable Bloom filter (sketches.bloom_build /
    bloom_contains): a probe that misses the parent's filter proves
    non-containment without the join; only near-1.0 survivors need
    this exact pass."""
    reports = []
    for name, child, child_col, parent, parent_col in pairs:
        ca = (
            child.filter(F.col(child_col).isNotNull())
            .select(F.col(child_col).cast("string").alias("_v"))
            .distinct()
        )
        pa = (
            parent.filter(F.col(parent_col).isNotNull())
            .select(F.col(parent_col).cast("string").alias("_v"))
            .distinct()
        )
        lhs = ca.agg(F.count(F.lit(1)).cast("bigint").alias("lhs_card"))
        inter = ca.join(pa, "_v", "left_semi").agg(
            F.count(F.lit(1)).cast("bigint").alias("contained")
        )
        # empty/all-NULL child column (review find: ANSI divide-by-
        # zero killed the whole sweep, and 0 == 0 would flag a
        # vacuous column as an FK candidate): ratio NULL, flag 0 —
        # an empty column asserts nothing about inclusion
        reports.append(
            lhs.crossJoin(inter).select(
                F.lit(name).alias("pair"),
                "lhs_card",
                "contained",
                F.when(
                    F.col("lhs_card") > 0,
                    _fs6(
                        F.col("contained").cast("double")
                        / F.col("lhs_card").cast("double")
                    ),
                ).alias("containment_r"),
                (
                    (F.col("lhs_card") > 0)
                    & (F.col("contained") == F.col("lhs_card"))
                )
                .cast("int")
                .alias("is_fk_candidate"),
            )
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


def column_affinity(
    columns: "list[tuple[str, DataFrame, str]]",
    k: int = 128,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Pairwise column-CONTENT affinity across tables — the data-
    catalog / schema-matching sweep: for every two candidate columns,
    estimate the Jaccard similarity, union size and intersection size
    of their DISTINCT value sets from KMV register tables alone. Where
    :func:`inclusion_profile` answers the directed FK question with an
    exact pass per pair, this answers the undirected "which columns
    hold the same kind of values" question for a WHOLE lattice at
    sketch cost: each column is summarized once (k registers — one
    scan per table however many of its columns participate in
    principle; this helper builds per column), and every pairwise
    question is a |columns|²·k register join with no data touch —
    the economics that make a 10,000-column estate's affinity matrix
    computable at all. Registers carry the kmv fam tag, so
    cross-family mixes raise.

    Returns sketches.kmv_overlap's schema keyed by ``column_id`` =
    the caller's name per column: (key_a, key_b, n_match,
    union_reg_sum, jaccard_e, union_e, inter_e)."""
    from gpi_etl_spark.operators.sketches import kmv_build, kmv_overlap

    regs = []
    for name, df, col in columns:
        d = (
            df.filter(F.col(col).isNotNull())
            .select(
                F.lit(name).alias("column_id"),
                F.col(col).cast("string").alias("_v"),
            )
            .distinct()
        )
        regs.append(
            kmv_build(
                d, "_v", group_cols=("column_id",), k=k,
                hash_mode=hash_mode,
            )
        )
    sk = regs[0]
    for r in regs[1:]:
        sk = sk.unionByName(r)
    return kmv_overlap(sk, "column_id")


def fd_g3(
    df: DataFrame,
    lhs: "str | list[str]",
    rhs: str,
    name: str | None = None,
) -> DataFrame:
    """Approximate-FD g3 error (Kivinen & Mannila '95; the TANE/Pyro
    measure — public method): the minimum FRACTION of rows that must
    be removed for ``lhs → rhs`` to hold exactly. :func:`fd_check`
    answers yes/no; g3 answers "how dirty, and what would the repair
    cost" — per determinant group, every row not carrying the group's
    most frequent dependent value is a violation:

        g3 = (n − Σ_lhs max_rhs count(lhs, rhs)) / n

    All counts are exact int64 and ride ONE corpus groupBy to the
    |lhs × rhs| cell table; the per-determinant (sum, max) and the
    global sum are cell-table algebra (map-side combined at every
    level). The one float is the final divide (fs6-pinned);
    ``holds_exact`` decides by integer equality (violations = 0) and
    agrees with :func:`fd_check` on NULL-free data.

    NULL semantics: a NULL DETERMINANT row is excluded (a key can't
    be NULL — fd_check's rule); a NULL dependent is a real value (the
    dirty-dimension case) and groups like any other. Multi-column
    determinants pass ``lhs`` as a list.

    Returns one row: ``(fd, n, keep_rows, g3_violations bigint,
    g3_r double, holds_exact int)``. At 100 TB the corpus pass is the
    one cell groupBy; a wide candidate sweep shares scans by running
    several fd_g3 calls over the same cached cell-ish projection."""
    lhs_cols = [lhs] if isinstance(lhs, str) else list(lhs)
    label = name or f"{','.join(lhs_cols)} -> {rhs}"
    keep = F.col(lhs_cols[0]).isNotNull()
    for c in lhs_cols[1:]:
        keep = keep & F.col(c).isNotNull()
    cells = (
        df.filter(keep)
        .groupBy(*lhs_cols, rhs)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_c"))
    )
    per_lhs = cells.groupBy(*lhs_cols).agg(
        F.sum("_c").cast("bigint").alias("_cnt"),
        F.max("_c").cast("bigint").alias("_mx"),
    )
    return per_lhs.agg(
        F.lit(label).alias("fd"),
        F.coalesce(F.sum("_cnt"), F.lit(0))
        .cast("bigint")
        .alias("n"),
        F.coalesce(F.sum("_mx"), F.lit(0))
        .cast("bigint")
        .alias("keep_rows"),
    ).select(
        "fd",
        "n",
        "keep_rows",
        (F.col("n") - F.col("keep_rows"))
        .cast("bigint")
        .alias("g3_violations"),
        F.when(F.col("n") == 0, F.lit(0.0))
        .otherwise(
            _fs6(
                (F.col("n") - F.col("keep_rows")).cast("double")
                / F.col("n").cast("double")
            )
        )
        .alias("g3_r"),
        (F.col("n") == F.col("keep_rows")).cast("int").alias(
            "holds_exact"
        ),
    )
