"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference has no streaming at all (SURVEY.md §2.9); this is the
engine-side primitive a continuous ingestion pipeline needs: per-key
running state maintained across micro-batches with exactly-once
semantics. Demo operator: per-user running event counter + value total
(integer cents, exact), emitting the updated running totals each batch.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, value_c bigint"
STATE_SCHEMA = "n_events bigint, value_c bigint"


def _update(key, pdfs, state: GroupState):
    (user_id,) = key
    n, v = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, v))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "value_c": [v]}
    )


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """events stream (user_id, value, ...) → running per-user totals."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
