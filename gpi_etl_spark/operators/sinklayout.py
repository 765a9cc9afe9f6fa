"""Sink layout control: partitioned writes, range-sorted files, compaction.

The reference's only layout decision is delete-then-reload of a month
prefix in SQL Server (HTGPIWASDE/__init__.py:74-77,124-134 — K4 in
SURVEY §2.1). At 100 TB the sink layout IS the query plan for every
downstream reader, so the engine owns it explicitly:

* **Hive partitioning** by low-cardinality keys (date, symbol) gives
  partition pruning — a reader filtering one month touches one
  directory, not the table.
* **Range-sorted files** on a high-cardinality key give parquet
  row-group min/max skipping within partitions (the poor man's index).
* **Compaction** bounds file counts: a daily incremental load that
  appends 32 task-files/day turns into millions of small files in a
  year unless someone rewrites them; small files kill scan parallelism
  economics (driver listing, task-per-file overhead).

All helpers are pure DataFrame-API so they run identically on a laptop
and a 1000-executor cluster.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    sort_cols: Sequence[str] = (),
    files_per_partition: int = 1,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write a hive-partitioned dataset with a bounded file count.
    ``fmt`` selects the columnar container (``parquet`` default,
    ``orc`` supported — both get partition pruning and predicate
    pushdown from the same layout; Avro needs the external
    spark-avro module, absent in this environment).

    Without the pre-``repartition``, every one of N upstream tasks
    writes a file into every one of P partition directories — N×P
    small files. Repartitioning on the partition keys first routes each
    partition's rows to ``files_per_partition`` tasks, so the layout is
    P×files_per_partition regardless of upstream parallelism. Within
    each file, ``sort_cols`` orders rows so parquet run-length/dict
    encoding and row-group min/max stats actually bite.
    """
    parts = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        # salt the router with a row-content hash so a hot partition
        # key fans out to k tasks regardless of the upstream layout
        # (spark_partition_id-style salts collapse when the input
        # arrives in fewer partitions than k)
        salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]),
                      F.lit(files_per_partition))
        parts = [*parts, salt]
    out = df.repartition(*parts)
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    out.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    range_cols: Sequence[str],
    num_files: int,
    mode: str = "overwrite",
) -> None:
    """Write globally range-ordered parquet: file k holds keys ≤ file
    k+1's keys, rows sorted inside each file.

    ``repartitionByRange`` samples the key distribution to cut
    ``num_files`` balanced ranges (skew-resistant, unlike hash), then
    each task writes one sorted file. Readers filtering on the range
    key skip whole files/row-groups via parquet min/max — the scalable
    substitute for an index on a 100 TB fact table, and the layout a
    sort-merge join can exploit without re-sorting.
    """
    out = df.repartitionByRange(num_files, *[F.col(c) for c in range_cols])
    out = out.sortWithinPartitions(*range_cols)
    out.write.mode(mode).parquet(path)


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_files: int,
    sort_cols: Sequence[str] = (),
) -> None:
    """Rewrite a small-file-fragmented dataset into ``target_files``
    files (optionally re-sorted). Reads and writes are distributed;
    nothing flows through the driver. Use a distinct ``dst_path`` and
    swap atomically at the catalog/manifest layer — overwriting the
    directory being read is not safe on object stores.
    """
    df = spark.read.parquet(src_path)
    if sort_cols:
        out = df.repartitionByRange(target_files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        # repartition, not coalesce: coalesce would propagate up and
        # run the whole fragmented scan in target_files tasks — the
        # shuffle is worth full read parallelism on exactly the
        # many-small-files input compaction exists for
        out = df.repartition(target_files)
    out.write.mode("overwrite").parquet(dst_path)


def zorder_key(x, y, bits: int = 10):
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative integer columns — the multi-dimensional clustering
    key: sorting/range-partitioning by it keeps rows close in BOTH
    dimensions close on disk, so parquet min/max stats prune scans
    filtered on EITHER column (the Delta/Iceberg OPTIMIZE ZORDER
    recipe, as a plain column expression). Callers bucket-normalize
    real values into the integer domain first (e.g. ``days since
    epoch & 1023``).

    Pure shift/and/or chain — JVM-side, exactly replayable in any
    engine with integer bit ops.
    """
    xb = (F.col(x) if isinstance(x, str) else x).cast("bigint")
    yb = (F.col(y) if isinstance(y, str) else y).cast("bigint")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xb, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(yb, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def zorder_sql(x: str, y: str, bits: int = 10) -> str:
    """DuckDB/ANSI spelling of :func:`zorder_key` (identical bit
    chain, fully parenthesized against precedence differences)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    x: str,
    y: str,
    bits: int = 10,
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order curve of two integer
    columns: ``repartitionByRange`` cuts balanced z-ranges (each file
    owns a contiguous curve segment = a compact 2-D tile), rows sorted
    by z inside each file so row-group min/max stats bite on both
    dimensions."""
    out = (
        df.withColumn("_z", zorder_key(x, y, bits))
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
    )
    out.write.mode(mode).parquet(path)


def _keyed_with_fids(base: DataFrame, n_files: int):
    """Shared file-id derivation for the zone-map family — the ONE
    definition both the simulating advisor and the executing writer
    use, so the simulation and the physical layout cannot drift:

    * range fid: ``(key − min)·n_files div (max − min + 1)`` (equal-
      width integer zones off the global min/max scalar);
    * hash fid:  ``poly_hash(key) mod n_files``.

    Returns ``(keyed, fid_range, fid_hash)`` where ``keyed`` is
    ``base`` with the one-row bounds scalar broadcast on, and the two
    fid expressions evaluate against it.

    Envelope (ADVICE r11): the range fid multiplies the key offset by
    ``n_files`` in int64, so the key span must satisfy
    ``(max − min)·n_files < 2^63`` — wider would silently wrap to
    wrong fids in non-ANSI mode. A conservative guard (double span
    test at HALF the true bound, wide margin over the 53-bit mantissa
    blur; the double subtraction itself cannot overflow) raises loudly
    instead — domains that wide should be laid out on
    ``poly_hash(key)`` or a truncated key. Evaluated against the
    one-row scalar riding every row — a comparison, not a corpus job.
    """
    from gpi_etl_spark.functions import xhash

    bounds = base.agg(
        F.min("_k").alias("_mn"), F.max("_k").alias("_mx")
    )
    fid_hash = F.pmod(
        xhash.poly_hash(F.col("_k").cast("string")), F.lit(n_files)
    ).cast("int")
    keyed = base.crossJoin(F.broadcast(bounds))
    span_ok = (
        F.col("_mx").cast("double") - F.col("_mn").cast("double")
    ) <= F.lit(float(2**62) / float(int(n_files)))
    fid_range_raw = F.expr(
        f"CAST((_k - _mn) * {int(n_files)} DIV (_mx - _mn + 1) AS INT)"
    )
    fid_range = F.when(span_ok, fid_range_raw).otherwise(
        F.raise_error(
            F.lit(
                "zone_map_advisor: key span * n_files would exceed "
                "the int64 envelope ((max-min)*n_files >= 2^62 "
                "conservative bound) — the range-layout file id "
                "would silently wrap. Advise on poly_hash(key) or a "
                "truncated key for domains this wide."
            )
        ).cast("int")
    )
    return keyed, fid_range, fid_hash


def write_zone_layout(
    df: DataFrame,
    key_col: str,
    n_files: int,
    layout: str,
    path: str,
    carry_cols: Sequence[str] = (),
) -> None:
    """EXECUTE one of the layouts zone_map_advisor simulates: compute
    the same fid the advisor predicted for every row (shared
    derivation — :func:`_keyed_with_fids`, so simulation and physics
    cannot drift), route each fid's rows to exactly one task, and
    write one hive directory per fid with the key rows inside
    (range layout additionally sorted by key within the file, the
    write_range_sorted discipline). The written dataset's parquet
    footer min/max over ``k`` IS the zone map the advisor predicted —
    measurable with :func:`measure_zone_map`.

    Distributed end-to-end: the only scalar is the one-row min/max
    bounds broadcast the fid derivation rides; the repartition is a
    single hash shuffle on fid (each fid lands in one task, so the
    layout is ≤ n_files files regardless of upstream parallelism).

    ``carry_cols`` ride along into the files unchanged (written next
    to ``k``) — the multi-dimensional path: lay out on a computed
    clustering key (e.g. the Z-order interleave) while the footer
    min/max of the carried ORIGINAL dimensions becomes the 2-D zone
    map readers actually prune on.
    """
    if layout not in ("range", "hash"):
        raise ValueError(
            f"write_zone_layout: layout must be 'range' or 'hash', "
            f"got {layout!r}"
        )
    base = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("bigint").alias("_k"),
        *[F.col(c) for c in carry_cols],
    )
    keyed, fid_range, fid_hash = _keyed_with_fids(base, n_files)
    fid = fid_range if layout == "range" else fid_hash
    routed = keyed.select(
        F.col("_k").alias("k"), *carry_cols, fid.alias("fid")
    ).repartition(n_files, F.col("fid"))
    if layout == "range":
        routed = routed.sortWithinPartitions("fid", "k")
    routed.write.mode("overwrite").partitionBy("fid").parquet(path)


def measure_zone_map(
    spark: SparkSession, path: str, layout: str
) -> DataFrame:
    """Read the REAL zone map back out of a :func:`write_zone_layout`
    dataset: walk each ``fid=N`` directory's parquet footers (pyarrow
    metadata — no data pages touched) and aggregate the row-group
    statistics of ``k`` to per-file zones ``(layout, fid, zmin, zmax,
    zrows)`` — the exact table the advisor predicts from its corpus
    pass. Driver-side by design and bounded by design: n_files footer
    reads of KB metadata each (the same driver cost every parquet
    planner pays to plan a scan), never rows. Raises if any footer is
    missing the statistics — an absent zone map would make every
    downstream skip claim vacuous."""
    import glob
    import os

    import pyarrow.parquet as pq

    rows = []
    for d in sorted(glob.glob(os.path.join(path, "fid=*"))):
        fid = int(os.path.basename(d).split("=", 1)[1])
        zmin = None
        zmax = None
        zrows = 0
        for fpath in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            md = pq.ParquetFile(fpath).metadata
            col_idx = None
            for i in range(md.num_columns):
                if md.schema.column(i).name == "k":
                    col_idx = i
                    break
            if col_idx is None:
                raise ValueError(
                    f"measure_zone_map: no 'k' column in {fpath}"
                )
            for rg in range(md.num_row_groups):
                group = md.row_group(rg)
                st = group.column(col_idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError(
                        "measure_zone_map: parquet footer carries no "
                        f"min/max statistics for {fpath} row group "
                        f"{rg} — the zone map is the product here, "
                        "an absent one must fail loudly."
                    )
                zmin = st.min if zmin is None else min(zmin, st.min)
                zmax = st.max if zmax is None else max(zmax, st.max)
                zrows += group.num_rows
        if zrows:
            rows.append((layout, fid, int(zmin), int(zmax), int(zrows)))
    return spark.createDataFrame(
        rows,
        "layout string, fid int, zmin bigint, zmax bigint, zrows bigint",
    )


def zone_prune_report_dims(
    zones: DataFrame, preds: DataFrame, match_rows: DataFrame
) -> DataFrame:
    """Multi-dimensional prune lattice: ``zones`` is the long-format
    per-(file, column) table of :func:`measure_zone_map_cols` (or a
    simulated twin), ``preds`` is ``(pred_id int, dim string,
    lo bigint, hi bigint)`` — each predicate prunes on the footer
    stats of ITS dimension (the parquet row-group rule, zone join on
    ``col = dim``). KB lattice either way."""
    lattice = preds.join(zones, preds["dim"] == zones["col"])
    pruned = F.col("cmax") < F.col("lo")
    pruned = pruned | (F.col("cmin") > F.col("hi"))
    report = lattice.groupBy(
        "pred_id", "dim", "lo", "hi", "layout"
    ).agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.sum(pruned.cast("bigint")).cast("bigint").alias(
            "files_pruned"
        ),
        F.sum(
            F.when(~pruned, F.col("zrows")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("rows_scanned"),
    )
    return report.join(match_rows, ["pred_id"]).select(
        "pred_id",
        "dim",
        "lo",
        "hi",
        "layout",
        "n_files",
        "files_pruned",
        "rows_scanned",
        "rows_matching",
    )


def measure_zone_map_cols(
    spark: SparkSession, path: str, layout: str, cols: Sequence[str]
) -> DataFrame:
    """Multi-dimensional twin of :func:`measure_zone_map`: one walk
    over the ``fid=N`` parquet footers, emitting a zone row per
    (file, measured column) — ``(layout, fid, col, cmin, cmax,
    zrows)``. This is what makes a computed clustering key (Z-order)
    USEFUL: the layout sorts on the interleave, but readers prune on
    the footer stats of the ORIGINAL dimensions carried in the file.
    Driver-side and bounded: n_files footers × |cols| stat lookups of
    KB metadata, never data pages. Raises on absent statistics (an
    absent zone map must fail loudly, not report zero pruning)."""
    import glob
    import os

    import pyarrow.parquet as pq

    rows = []
    for d in sorted(glob.glob(os.path.join(path, "fid=*"))):
        fid = int(os.path.basename(d).split("=", 1)[1])
        stats = {c: [None, None, 0] for c in cols}
        for fpath in sorted(glob.glob(os.path.join(d, "*.parquet"))):
            md = pq.ParquetFile(fpath).metadata
            idx = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            for c in cols:
                if c not in idx:
                    raise ValueError(
                        f"measure_zone_map_cols: no {c!r} column in "
                        f"{fpath}"
                    )
            for rg in range(md.num_row_groups):
                group = md.row_group(rg)
                for c in cols:
                    st = group.column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        raise ValueError(
                            "measure_zone_map_cols: parquet footer "
                            f"carries no min/max statistics for {c!r}"
                            f" in {fpath} row group {rg} — the zone "
                            "map is the product here, an absent one "
                            "must fail loudly."
                        )
                    cur = stats[c]
                    cur[0] = st.min if cur[0] is None else min(
                        cur[0], st.min
                    )
                    cur[1] = st.max if cur[1] is None else max(
                        cur[1], st.max
                    )
                stats[cols[0]][2] += group.num_rows
        zrows = stats[cols[0]][2]
        if zrows:
            for c in cols:
                rows.append(
                    (layout, fid, c, int(stats[c][0]),
                     int(stats[c][1]), int(zrows))
                )
    return spark.createDataFrame(
        rows,
        "layout string, fid int, col string, cmin bigint, "
        "cmax bigint, zrows bigint",
    )


def layout_workload_advisor(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_files: int,
    workload: "Sequence[tuple[int, str, int, int, int]]",
    bits: int = 10,
) -> DataFrame:
    """Choose the table LAYOUT for a whole WORKLOAD — the decision
    q271/q278/q279 feed: given weighted range predicates over two
    dimensions ``(pred_id, dim 'x'|'y', lo, hi, weight)``, price four
    candidate 64-file layouts by total weighted rows scanned under
    parquet min/max skipping and pick the argmin:

    * ``range_x`` / ``range_y`` — equal-width zones of one dimension
      (perfect pruning there, none on the other);
    * ``zorder``  — equal-width zones of the Morton interleave
      (both dimensions prune at tile granularity);
    * ``hash``    — poly_hash of the composite key (the no-layout
      strawman: every file spans everything).

    ONE corpus pass builds all four layouts' zone tables (explode of
    four (layout, fid) structs off the one-row six-scalar bounds
    broadcast, map-side-combined groupBy to ≤ 4·n_files rows carrying
    BOTH dimensions' min/max); the cost model is the q279 prune rule
    on each predicate's OWN dimension, weighted and summed — exact
    int64 end to end (weight · zrows sums; envelope: Σ weight · rows
    < 2^63). The argmin broadcasts the one-row (min cost, first
    layout name) back over the 4-row cost table (q261's bounded
    pattern); ties break by layout name so the choice is total.
    Returns ``(layout string, wcost bigint, chosen boolean)`` — the
    decision AND its price trace, replayable bit-for-bit. At 100 TB
    the pass is one scan; the decision is what a layout migration
    (q278/q279's executed writes) is justified by."""
    from gpi_etl_spark.functions import xhash

    base = df.filter(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        F.col(x_col).cast("bigint").alias("_x"),
        F.col(y_col).cast("bigint").alias("_y"),
    ).withColumn("_z", zorder_key("_x", "_y", bits))
    bounds = base.agg(
        F.min("_x").alias("_mnx"), F.max("_x").alias("_mxx"),
        F.min("_y").alias("_mny"), F.max("_y").alias("_mxy"),
        F.min("_z").alias("_mnz"), F.max("_z").alias("_mxz"),
    )
    keyed = base.crossJoin(F.broadcast(bounds))

    def _fid(k, mn, mx):
        return F.expr(
            f"CAST(({k} - {mn}) * {int(n_files)} "
            f"DIV ({mx} - {mn} + 1) AS INT)"
        )

    fid_hash = F.pmod(
        xhash.poly_hash(
            F.concat_ws(
                "|", F.col("_x").cast("string"),
                F.col("_y").cast("string"),
            )
        ),
        F.lit(n_files),
    ).cast("int")
    tagged = keyed.select(
        "_x",
        "_y",
        F.explode(
            F.array(
                F.struct(
                    F.lit("range_x").alias("layout"),
                    _fid("_x", "_mnx", "_mxx").alias("fid"),
                ),
                F.struct(
                    F.lit("range_y").alias("layout"),
                    _fid("_y", "_mny", "_mxy").alias("fid"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    _fid("_z", "_mnz", "_mxz").alias("fid"),
                ),
                F.struct(
                    F.lit("hash").alias("layout"),
                    fid_hash.alias("fid"),
                ),
            )
        ).alias("_lf"),
    ).select("_x", "_y", "_lf.layout", "_lf.fid")
    zones = tagged.groupBy("layout", "fid").agg(
        F.min("_x").alias("xmin"),
        F.max("_x").alias("xmax"),
        F.min("_y").alias("ymin"),
        F.max("_y").alias("ymax"),
        F.count(F.lit(1)).cast("bigint").alias("zrows"),
    )
    preds = df.sparkSession.createDataFrame(
        [
            (int(i), str(d), int(lo), int(hi), int(w))
            for i, d, lo, hi, w in workload
        ],
        "pred_id int, dim string, lo bigint, hi bigint, w bigint",
    )
    lattice = preds.crossJoin(F.broadcast(zones))
    pruned = F.when(
        F.col("dim") == "x",
        (F.col("xmax") < F.col("lo")) | (F.col("xmin") > F.col("hi")),
    ).otherwise(
        (F.col("ymax") < F.col("lo")) | (F.col("ymin") > F.col("hi"))
    )
    costs = lattice.groupBy("layout").agg(
        F.sum(
            F.when(~pruned, F.col("w") * F.col("zrows")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("wcost")
    )
    best = costs.agg(
        F.min(F.struct("wcost", "layout")).alias("_b")
    ).select(
        F.col("_b.wcost").alias("_bc"), F.col("_b.layout").alias("_bl")
    )
    return costs.crossJoin(F.broadcast(best)).select(
        "layout",
        "wcost",
        (
            (F.col("wcost") == F.col("_bc"))
            & (F.col("layout") == F.col("_bl"))
        ).alias("chosen"),
    )


def zone_map_advisor(
    df: DataFrame,
    key_col: str,
    n_files: int,
    predicates: "Sequence[tuple[int, int]]",
) -> DataFrame:
    """Quantify what a sort-by-key layout is WORTH before paying for
    the rewrite: simulate the parquet zone-map (row-group min/max)
    skipping a range predicate gets under (a) a RANGE layout — files
    hold equal-width key zones, the write_range_sorted outcome — and
    (b) a HASH layout, the what-you-get-by-default strawman where
    every file spans the whole key range and nothing ever prunes.
    This is the planner-facing half of the sinklayout family: the
    min/max-skipping claim on write_range_sorted's docstring, measured
    instead of asserted.

    Mechanics (every number exact int64, fully DuckDB-replayable):
    file ids are ``(key − min)·n_files div (max − min + 1)`` for the
    range layout (integer zone arithmetic off the global min/max
    scalar) and ``poly_hash(key) mod n_files`` for the hash layout;
    ONE corpus pass builds both layouts' zone tables (explode of two
    (layout, fid) structs, map-side-combined groupBy to ≤ 2·n_files
    rows); a file is PRUNED for predicate [lo, hi] iff its zone
    ``max < lo`` or ``min > hi`` (the parquet row-group rule). The
    exact per-predicate match counts ride the same corpus pass as
    conditional sums, so the report states selectivity next to scan
    fraction.

    Envelope (ADVICE r11): the range-layout file id multiplies the
    key offset by ``n_files`` in int64, so the key span must satisfy
    ``(max − min) · n_files < 2^63`` — a span wider than that would
    silently wrap to wrong fids in non-ANSI mode. A conservative
    guard (double-precision span test at half the true bound, wide
    margin over the 53-bit mantissa blur) raises loudly instead;
    domains that wide should be advised on ``poly_hash(key)`` or a
    truncated key instead.

    NULL keys are excluded from both layouts (parquet null-count
    stats prune them separately — out of scope, documented). Returns
    one row per (predicate, layout): ``(pred_id int, lo, hi, layout,
    n_files int, files_pruned bigint, rows_scanned bigint,
    rows_matching bigint)``. Scale: the corpus touches two aggregates
    (zone build + match counts); the prune decision is a
    |preds| × 2·n_files lattice join — KB."""
    base = df.filter(F.col(key_col).isNotNull()).select(
        F.col(key_col).cast("bigint").alias("_k")
    )
    keyed, fid_range, fid_hash = _keyed_with_fids(base, n_files)
    tagged = keyed.select(
        "_k",
        F.explode(
            F.array(
                F.struct(
                    F.lit("range").alias("layout"),
                    fid_range.alias("fid"),
                ),
                F.struct(
                    F.lit("hash").alias("layout"),
                    fid_hash.alias("fid"),
                ),
            )
        ).alias("_lf"),
    ).select("_k", "_lf.layout", "_lf.fid")
    zones = tagged.groupBy("layout", "fid").agg(
        F.min("_k").alias("zmin"),
        F.max("_k").alias("zmax"),
        F.count(F.lit(1)).cast("bigint").alias("zrows"),
    )
    preds = _pred_frame(df.sparkSession, predicates)
    match_rows = _match_counts(base, preds, predicates)
    return zone_prune_report(zones, preds, match_rows)


def _pred_frame(spark: SparkSession, predicates) -> DataFrame:
    """``(pred_id int, lo bigint, hi bigint)`` literal frame shared by
    the advisor and the executed capstone."""
    return spark.createDataFrame(
        [(i, int(lo), int(hi)) for i, (lo, hi) in enumerate(predicates)],
        "pred_id int, lo bigint, hi bigint",
    )


def _match_counts(
    base: DataFrame, preds: DataFrame, predicates
) -> DataFrame:
    """Exact per-predicate match counts in ONE pass over ``base``
    (conditional sums), pivoted onto the preds frame via a one-row
    scalar broadcast. Returns ``(pred_id, lo, hi, rows_matching)``."""
    match_aggs = [
        F.sum(
            ((F.col("_k") >= int(lo)) & (F.col("_k") <= int(hi)))
            .cast("bigint")
        ).alias(f"_m{i}")
        for i, (lo, hi) in enumerate(predicates)
    ]
    matches = base.agg(*match_aggs)
    return preds.crossJoin(F.broadcast(matches)).select(
        "pred_id",
        "lo",
        "hi",
        F.coalesce(
            *[
                F.when(F.col("pred_id") == i, F.col(f"_m{i}"))
                for i in range(len(predicates))
            ]
        )
        .cast("bigint")
        .alias("rows_matching"),
    )


def zone_prune_report(
    zones: DataFrame, preds: DataFrame, match_rows: DataFrame
) -> DataFrame:
    """The preds × zones prune lattice shared by the SIMULATED advisor
    and the EXECUTED capstone: a zone is pruned for [lo, hi] iff its
    ``zmax < lo`` or ``zmin > hi`` (the parquet row-group rule).
    ``zones`` is ``(layout, fid, zmin, zmax, zrows)`` — from the
    advisor's corpus pass or from real parquet footers; the lattice is
    |preds| × Σ zones rows, KB either way."""
    lattice = preds.crossJoin(F.broadcast(zones))
    pruned = F.col("zmax") < F.col("lo")
    pruned = pruned | (F.col("zmin") > F.col("hi"))
    report = lattice.groupBy("pred_id", "lo", "hi", "layout").agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.sum(pruned.cast("bigint")).cast("bigint").alias(
            "files_pruned"
        ),
        F.sum(
            F.when(~pruned, F.col("zrows")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("rows_scanned"),
    )
    return report.join(match_rows, ["pred_id", "lo", "hi"]).select(
        "pred_id",
        "lo",
        "hi",
        "layout",
        "n_files",
        "files_pruned",
        "rows_scanned",
        "rows_matching",
    )
