"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md §2.9: 'applyInPandasWithState for custom stateful
operators').

``running_user_stats`` keeps one state tuple per key — (event count,
value sum) — and emits the updated totals every micro-batch. It is the
arbitrary-stateful template: swap the state tuple and the fold for any
per-key online algorithm (sessionizers, CUSUM detectors, per-user
sketches). State size is O(keys), independent of stream length."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

STATS_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _update(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Streaming per-user running (count, sum(value)) with explicit
    state — emits the current totals for every key touched by the
    micro-batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
