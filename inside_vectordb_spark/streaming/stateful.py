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


class _UserTotalsProcessor:
    """Spark-4 ``StatefulProcessor`` twin of ``_update_user_totals``:
    same running (n_events, total_value) per user, expressed on the
    ``transformWithState`` API — typed state handles (ValueState
    here; ListState/MapState/timers available), per-state TTL, and a
    RocksDB-backed store, the surface Spark is converging stateful
    pipelines on. Kept semantically identical so it shares the batch
    aggregate oracle with the applyInPandasWithState twin."""

    def init(self, handle) -> None:  # StatefulProcessorHandle
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        prev = self._totals.get() if self._totals.exists() else (0, 0.0)
        n, total = int(prev[0]), float(prev[1])
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``transformWithStateInPandas`` flavor of the running totals —
    requires the RocksDB state store provider (the caller sets it for
    the drain; see registry/streaming.py)."""
    from pyspark.sql.streaming import StatefulProcessor

    class UserTotalsProcessor(_UserTotalsProcessor, StatefulProcessor):
        pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserTotalsProcessor(),
        outputStructType=_OUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def has_tws_runtime() -> bool:
    """``transformWithStateInPandas``'s worker-side state protocol
    needs ``google.protobuf``, which this container doesn't ship —
    the same import-gated seam as the native hnswlib /
    sentence-transformers branches (tests/test_optional_deps.py runs
    the drain when the wheel is present)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
