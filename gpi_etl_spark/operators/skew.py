"""Skew-mitigated joins: key salting for hot keys.

AQE's skew-join handling (enabled in session.py) splits oversized
shuffle partitions at runtime, but it only helps sort-merge joins and
only after a shuffle materializes. Salting attacks the problem in the
plan itself: the skewed (fact) side scatters each hot key across
``n_salts`` sub-keys, the small (dim) side replicates its matching rows
once per salt, and the join key becomes (key, salt) — so one hot key's
rows land on ``n_salts`` reducers instead of one.

At 100 TB this is the difference between a straggler task holding a
whole stage and an even spread; the dim-side blow-up is bounded at
|hot_keys| × n_salts rows, negligible for dimension tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def top_keys(df: DataFrame, key: str | Sequence[str], n: int = 16) -> list:
    """The ``n`` heaviest key values (driver-side list — bounded by n).
    Use to pick which keys are worth salting; anything else joins
    unsalted."""
    keys = [key] if isinstance(key, str) else list(key)
    rows = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .orderBy(F.col("__cnt").desc())
        .limit(n)
        .collect()
    )
    return [r[keys[0]] if len(keys) == 1 else tuple(r[k] for k in keys) for r in rows]


def salted_join(
    facts: DataFrame,
    dims: DataFrame,
    on: str,
    n_salts: int = 16,
    hot_keys: Sequence | None = None,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``facts ⋈ dims ON on`` with hot-key salting.

    ``hot_keys=None`` salts every key (uniform scatter — right when the
    whole fact side is skew-prone); a list salts only those values and
    keeps a salt of 0 elsewhere, so the dim side replicates only its
    hot rows. Fact-side salt is ``rand(seed)``-derived — retry-safe
    enough for joins (any salt value joins correctly; determinism of
    the *assignment* is not a correctness condition, only the (key,
    salt) match is).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    scatter = F.floor(F.rand(seed) * n_salts).cast("int")
    replicate = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    if hot_keys is not None:
        is_hot = F.col(on).isin(list(hot_keys))
        f = facts.withColumn(SALT, F.when(is_hot, scatter).otherwise(F.lit(0)))
        # when() cannot wrap a generator (explode) — union two dim branches
        d = dims.filter(is_hot).withColumn(SALT, replicate).unionByName(
            dims.filter(~is_hot).withColumn(SALT, F.lit(0))
        )
    else:
        f = facts.withColumn(SALT, scatter)
        d = dims.withColumn(SALT, replicate)
    return f.join(d, [on, SALT], how).drop(SALT)
