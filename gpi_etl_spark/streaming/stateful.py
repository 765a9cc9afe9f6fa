"""Custom stateful streaming operators (applyInPandasWithState).

The reference has no streaming (SURVEY §2.9); its incrementality is
batch high-watermark reloads. The Spark-native upgrade path for
*custom* per-key state — running totals that survive across micro-
batches, counters the built-in windowed aggs can't express — is
``applyInPandasWithState``: per-key Arrow batches plus an explicit
GroupState, executing distributed with the state store checkpointed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_running(key, pdf_iter, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event count, value sum) across ALL micro-batches
    seen so far — emitted in update mode, one row per user per batch in
    which that user appeared. On a static frame (batch DataFrame) use a
    plain groupBy; this operator exists for the readStream path.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_running,
        outputStructType=RUNNING_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
