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


EWMA_SCHEMA = "user_id bigint, n_points bigint, ewma double"
EWMA_STATE_SCHEMA = "n bigint, acc double"


def make_ewma_update(alpha: float):
    """Build the per-key EWMA state function for ``alpha``.

    Within each delivery the key's rows are sorted by (ts, event_id)
    BEFORE folding — micro-batch arrival order is file order, not
    event order — and the fold continues from the stored (n, acc)
    state. With a single AvailableNow batch (or ts-ordered arrivals)
    the final state is EXACTLY the batch ``windows.ewma_final`` answer
    (same IEEE blend, same order); across multiple out-of-order
    batches the fold is exact within each delivery and approximate
    across them — true ts-exactness for late data needs a
    watermark-bounded reorder upstream, which is stated here rather
    than papered over. The recursive blend runs as a per-row Python
    fold over the key's rows: the stateful edge is Python by
    construction (applyInPandasWithState), the same boundary class as
    the model-scoring edge.
    """
    one_minus = 1.0 - alpha

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        n, acc = state.get if state.exists else (0, 0.0)
        parts = [pdf for pdf in pdf_iter]
        if parts:
            pdf = pd.concat(parts) if len(parts) > 1 else parts[0]
            pdf = pdf.sort_values(["ts", "event_id"])
            for x in pdf["value"].tolist():
                if n == 0:
                    acc = float(x)
                else:
                    acc = alpha * float(x) + one_minus * acc
                n += 1
        state.update((n, acc))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_points": [n], "ewma": [acc]}
        )

    return update


def running_user_ewma(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per-user running EWMA across micro-batches (update mode): the
    custom-NUMERIC-state companion to :func:`running_user_totals` —
    built-in windowed aggs can't express a recursive blend, so the
    state store carries (n, acc) per key."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_ewma_update(alpha),
        outputStructType=EWMA_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
