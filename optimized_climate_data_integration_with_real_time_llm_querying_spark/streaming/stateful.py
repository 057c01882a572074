"""Custom stateful streaming operator: running monthly means.

The reference's A6 group-mean (monthly city averages,
``ERA5_preprocessing.ipynb:cell8``) incrementalized: state per
(event_type, month) is just (n, sum) — merged per micro-batch via
``applyInPandasWithState``, emitting the updated running mean. This
is the arbitrary-stateful escape hatch for rollups the built-in
windowed aggregation can't express (e.g. means that must be
re-emitted with full history semantics, custom eviction policies).

Scale: state is two scalars per group — size is O(#groups), never
O(#events); groups shard across executors by the grouping key.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, month string, n bigint, mean double"
STATE_SCHEMA = "n bigint, sum double"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    event_type, month = key
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "month": [month],
            "n": [n],
            "mean": [round(total / n, 4) if n else None],
        }
    )


def running_monthly_means(events: DataFrame) -> DataFrame:
    """events (streaming) -> one updated (event_type, month) running
    mean row per group per micro-batch."""
    keyed = events.select(
        "event_type",
        F.date_format("ts", "yyyy-MM").alias("month"),
        "value",
    )
    return keyed.groupBy("event_type", "month").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
