"""Fixed-width text scan (S4) — native, distributed.

Reference: ``pd.read_fwf(url, widths=[10,5,4,...], skiprows=4)`` for the
NOAA ENSO weekly SST file (HTGPIENSO/__init__.py:74-78). Here the file
is read with ``spark.read.text`` (splittable, scales to any size) and
columns are carved with ``substring`` projections — all codegen'd.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_fixed_width(
    lines: DataFrame,
    widths: Sequence[int],
    names: Sequence[str],
    value_col: str = "value",
    skip_rows: int = 0,
    trim_values: bool = True,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Carve ``value_col`` into trimmed string columns by width.

    ``skip_rows`` drops the first N physical lines (header junk) using
    a monotonic id — fine for header-skipping because Spark assigns ids
    in file order within ``spark.read.text``'s single initial pass.
    ``keep_cols`` passes additional input columns through unchanged.
    """
    if len(widths) != len(names):
        raise ValueError("widths and names must align")
    df = lines
    if skip_rows:
        # monotonically_increasing_id alone is NOT row-ordered across
        # partitions; it is ordered *within* a partition and partition
        # ids follow file offsets, so a per-file row_number over it
        # reproduces pandas' skiprows semantics (per input file).
        from pyspark.sql import Window

        w = Window.partitionBy(F.input_file_name()).orderBy(
            F.monotonically_increasing_id()
        )
        df = (
            df.withColumn("_line", F.row_number().over(w))
            .filter(F.col("_line") > skip_rows)
            .drop("_line")
        )
    cols = [F.col(c) for c in keep_cols]
    pos = 1
    for width, name in zip(widths, names):
        c = F.substring(F.col(value_col), pos, width)
        cols.append((F.trim(c) if trim_values else c).alias(name))
        pos += width
    return df.select(*cols)


def read_fwf(
    spark: SparkSession,
    path: str,
    widths: Sequence[int],
    names: Sequence[str],
    skip_rows: int = 0,
) -> DataFrame:
    """Distributed fixed-width file scan."""
    return parse_fixed_width(spark.read.text(path), widths, names, "value", skip_rows)
