"""Custom stateful streaming operator via ``applyInPandasWithState``.

A running per-user accumulator: for every user, maintain
(n_events, total_value) across micro-batches and emit the updated
totals each time the user appears in a batch. This is the
arbitrary-state API the engine exposes for operators that windowed
aggregations can't express (per-key counters, custom sessionization
policies, online sketches).

Scale notes: state is partitioned by the group key across executors
and persisted in the state store between batches; memory is bounded
by #active keys × state size. A production deployment adds a state
TTL (``GroupStateTimeout``) to retire idle keys; the drain-a-static-
directory use here keeps NoTimeout so the final emit equals the
batch aggregate exactly (asserted by the registered query's oracle).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user running totals; emits one updated row per
    (user, batch) in update mode."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
