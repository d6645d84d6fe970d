"""Custom stateful streaming operator: applyInPandasWithState.

The arbitrary-stateful surface beyond windowed aggregation — per-key
state that survives across micro-batches (here: a running per-user
activity accumulator with a high-value alert flag). The reference has
no analog (its only cross-batch state is the warehouse itself); this
is the engine's answer for streaming logic that windows can't express.

Scale: state lives in the state store partitioned by the grouping key
— one shuffle per batch on user_id; state size is O(distinct keys),
each entry a few counters.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id BIGINT, batch_events BIGINT, total_events BIGINT, "
    "total_value DOUBLE, high_value_alert BOOLEAN"
)
STATE_SCHEMA = "total_events BIGINT, total_value DOUBLE"


def _accumulate(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    total_events, total_value = state.get if state.exists else (0, 0.0)
    batch_events = 0
    for pdf in pdfs:
        batch_events += len(pdf)
        # fixed-point cents keep the running sum deterministic across
        # batch orderings (same rule as functions.numeric).
        total_value += round(pdf["value"].mul(100).round().sum()) / 100.0
    total_events += batch_events
    state.update((total_events, total_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "batch_events": [batch_events],
            "total_events": [total_events],
            "total_value": [total_value],
            "high_value_alert": [total_value > 1000.0],
        }
    )


def running_user_totals(stream_df: DataFrame) -> DataFrame:
    """Per-user running totals across micro-batches with an alert
    threshold — emits one update row per active user per batch."""
    return stream_df.groupBy("user_id").applyInPandasWithState(
        _accumulate,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
