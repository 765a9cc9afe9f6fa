"""Schema evolution across corpus generations.

A corpus ingested over months drifts: new fields appear, counters
outgrow int, a numeric column starts arriving as string from one
upstream. The reference's answer was pandas' silent dtype coercion on
append (SURVEY §1.3 — headers applied by convention, enforced
nowhere); here drift is handled explicitly so a union over N
generations is deterministic:

* :func:`read_merged` — parquet ``mergeSchema`` read for a directory
  whose files disagree on columns (Spark unions the footers).
* :func:`widen_and_union` — union DataFrames whose schemas differ by
  missing columns AND by reconcilable types, casting every side to the
  per-column widest type first (int→long→double; anything vs string →
  string). ``unionByName(allowMissingColumns=True)`` alone throws on
  int-vs-long, which is exactly the drift a long-lived pipeline hits.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: widening chain for numeric drift; index = width rank
_NUMERIC_ORDER = [
    T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
    T.FloatType(), T.DoubleType(),
]


def read_merged(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet dataset whose files carry different (compatible)
    schemas — Spark merges the footers into the union schema and fills
    absent columns with NULL. Costs one extra footer pass; enable only
    on datasets that actually evolve."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    order = {d.simpleString(): i for i, d in enumerate(_NUMERIC_ORDER)}
    sa, sb = a.simpleString(), b.simpleString()
    if sa in order and sb in order:
        return _NUMERIC_ORDER[max(order[sa], order[sb])]
    # irreconcilable numerics/structs/etc. fall back to string — the
    # lossless common representation (re-parse downstream if needed)
    return T.StringType()


def widen_and_union(frames: Sequence[DataFrame]) -> DataFrame:
    """Union corpus generations with drifted schemas.

    Column set = union of all names (order of first appearance); column
    type = widest reconcilable type across generations; missing columns
    become NULL. Pure metadata + per-row casts — no shuffle.
    """
    if not frames:
        raise ValueError("widen_and_union needs at least one frame")
    types: dict[str, T.DataType] = {}
    order: list[str] = []
    for df in frames:
        for f in df.schema.fields:
            if f.name not in types:
                types[f.name] = f.dataType
                order.append(f.name)
            else:
                types[f.name] = _widen(types[f.name], f.dataType)
    out = None
    for df in frames:
        have = set(df.columns)
        cols = [
            (F.col(n).cast(types[n]) if n in have
             else F.lit(None).cast(types[n])).alias(n)
            for n in order
        ]
        aligned = df.select(*cols)
        out = aligned if out is None else out.unionByName(aligned)
    return out
