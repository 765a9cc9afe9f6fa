"""Grouped-map pandas operators (applyInPandas).

The sanctioned escape hatch (SURVEY §2.10) for per-group logic that
native expressions can't reach: each group arrives as ONE Arrow-backed
pandas frame on an executor. Everything here is also expressible
natively (window aggregates) — these exist to keep the UDF path
exercised and oracle-checked, so real custom logic (model scoring,
iterative per-group fits) has a proven template. Keep groups bounded:
one group must fit in one executor's memory — partition-count the keys
at 100 TB accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def group_zscore(
    df: DataFrame,
    group_cols: list[str],
    value_col: str = "value",
    out_col: str = "z",
) -> DataFrame:
    """Per-group z-score via applyInPandas (sample stddev, ddof=1);
    groups with stddev 0/undefined get z=0. Native equivalent: value
    minus avg-over-window divided by stddev_samp-over-window."""
    import pandas as pd  # noqa: F401 (executor-side)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {out_col} double"

    def fn(pdf):
        sd = pdf[value_col].std(ddof=1)
        mu = pdf[value_col].mean()
        z = (pdf[value_col] - mu) / sd if sd and sd == sd else 0.0
        return pdf.assign(**{out_col: z})

    return df.groupBy(*group_cols).applyInPandas(fn, out_schema)


def greedy_pack(
    df: DataFrame,
    size_col: str,
    group_col: str,
    order_col: str = "doc_id",
    budget: int = 2048,
    bin_col: str = "bin",
) -> DataFrame:
    """Exact-capacity greedy sequence packing: walk each group in
    ``order_col`` order; when adding the next document would exceed
    ``budget`` and the current bin is non-empty, close it and start the
    next. Unlike the window-only ``curation.pack_budget_bins`` (bins
    can overflow at the boundary), bins here never exceed the budget
    unless a single document alone does.

    Running-state-with-reset is not expressible as a window aggregate,
    so this is the genuine applyInPandas case (SURVEY §2.10): the whole
    group streams to one executor as Arrow batches and the packer is a
    linear scan. At 100 TB, shard the group key (e.g. lang × shard) so
    each group fits one task; packing quality is unaffected because
    bins never span groups anyway.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + f", {bin_col} int"

    def fn(pdf):
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins, cur, b = [], 0, 0
        for s in pdf[size_col]:
            if cur > 0 and cur + s > budget:
                b += 1
                cur = 0
            cur += s
            bins.append(b)
        return pdf.assign(**{bin_col: bins})

    return df.groupBy(group_col).applyInPandas(fn, out_schema)
