"""Custom stateful streaming operator via ``applyInPandasWithState``
(T6 extension space — the reference has no stateful ops beyond
engine-side merge dedup, SURVEY.md §2.9).

Per-key running totals maintained in ``GroupState`` across
micro-batches: the canonical shape for wrapping arbitrary per-entity
logic (sessionization, running dedup counters, rate trackers) that
neither windowed aggs nor ``dropDuplicates`` can express.

Scale notes: state lives in the state store partitioned by the group
key — the shuffle is on that key only, and each micro-batch touches
only keys present in the batch. Totals are carried as integer cents so
cross-batch accumulation is exact and independent of batch order
(float addition would drift by file-to-batch assignment).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUTPUT_FIELDS = "n_events long, cents_total long"
STATE_SCHEMA = "cnt long, cents long"


def _make_update(key_name: str):
    """Build the per-group update fn with the OUTPUT KEY COLUMN named
    after the caller's group key — pandas output maps to the declared
    schema BY NAME, so a hardcoded "user_id" label would emit nulls
    (not a rename) for any other key column."""

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        cnt, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            cnt += len(pdf)
            cents += int(pdf["cents"].sum())
        state.update((cnt, cents))
        yield pd.DataFrame(
            {key_name: [key[0]], "n_events": [cnt], "cents_total": [cents]}
        )

    return _update


def running_user_totals(stream: DataFrame, key: str = "user_id") -> DataFrame:
    """Running (count, cents_total) per key, emitted on every batch the
    key appears in (update mode). Input needs a ``cents`` long column."""
    return stream.groupBy(key).applyInPandasWithState(
        _make_update(key),
        outputStructType=f"{key} long, {_OUTPUT_FIELDS}",
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_user_totals_tws(
    stream: DataFrame, key: str = "user_id"
) -> DataFrame:
    """The same running totals on Spark 4's ``transformWithState``
    API (SPARK-46815): a ``StatefulProcessor`` with a typed
    ``ValueState`` instead of ``applyInPandasWithState``'s positional
    GroupState tuple. This is the forward path — composable named
    state variables (value/list/map), timers, TTL — and what new
    stateful operators should target; the legacy wrapper above stays
    for parity. Requires the RocksDB state store provider, AND a
    Python environment with ``google.protobuf`` — TWS ships its state
    protocol over protobuf and its Python runner dies without it
    (verified in this sandbox: STREAMING_PYTHON_RUNNER_INITIALIZATION
    _FAILURE, ImportError on google.protobuf; no package installation
    available). tests/test_streaming.py gates the live execution on
    that import, chardet-style; the legacy applyInPandasWithState
    path carries the driver-checked oracle either way."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    key_name = key  # handleInputRows' own `key` arg shadows the param

    class _RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            cnt, cents = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            for pdf in rows:
                cnt += len(pdf)
                cents += int(pdf["cents"].sum())
            self._totals.update((cnt, cents))
            yield pd.DataFrame(
                {
                    key_name: [key[0]],
                    "n_events": [cnt],
                    "cents_total": [cents],
                }
            )

        def close(self) -> None:
            pass

    return stream.groupBy(key).transformWithStateInPandas(
        statefulProcessor=_RunningTotals(),
        outputStructType=f"{key} long, {_OUTPUT_FIELDS}",
        outputMode="Update",
        timeMode="None",
    )
