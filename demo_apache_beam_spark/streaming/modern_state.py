"""Arbitrary stateful streaming on the transformWithState API (Spark 4.x).

``applyInPandasWithState`` (see ``stateful.py``) carries one opaque state
tuple per key; ``transformWithStateInPandas`` is its successor — named,
independently-evolvable state variables (value/list/map), optional TTL,
and processing/event-time timers, all backed by the RocksDB state store.
The reference has no stateful DoFns at all (SURVEY.md §2.9), so like
``stateful.py`` this is extension surface: the canonical running-totals
processor, expressed on the modern API so a user migrating real Beam
`@StateId` DoFns has both idioms available.

100 TB posture: state is two longs per user (constant per key), lives in
RocksDB off-heap with incremental checkpointing, and is keyed by the same
column the aggregation shuffles on — no extra exchange beyond the groupBy.
transformWithState REQUIRES the RocksDB provider
(``spark.sql.streaming.stateStore.providerClass`` =
``...state.RocksDBStateStoreProvider``); the HDFS-backed default store
rejects it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

try:  # pyspark >= 4.0, plus protobuf (the state-server wire format —
    # absent in some minimal runtimes; the operator is then unavailable
    # and its test skips, same policy as the codec decode stub)
    import google.protobuf.descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - older/minimal runtime
    StatefulProcessor = object  # type: ignore[assignment,misc]
    StatefulProcessorHandle = None  # type: ignore[assignment,misc]
    HAS_TRANSFORM_WITH_STATE = False

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

TOTALS_OUTPUT_SCHEMA = "user string, total_score long, n_events long"


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running score total + event count in a named ValueState."""

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._totals = handle.getValueState("totals", "total long, n_events long")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        prior = self._totals.get()
        total, n = (int(prior[0]), int(prior[1])) if prior else (0, 0)
        for pdf in rows:
            total += int(pdf["score"].sum())
            n += len(pdf)
        self._totals.update((total, n))
        yield pd.DataFrame(
            {"user": [key[0]], "total_score": [total], "n_events": [n]}
        )

    def close(self) -> None:
        pass


def user_running_totals_tws(events: DataFrame) -> DataFrame:
    """A1/A2 running per-user totals as a transformWithState processor —
    update-mode emission per micro-batch, final state ≡ the batch
    ``groupBy(user).sum(score)`` (asserted in pytest stream-vs-batch).

    ``events`` must carry (user, score) — the parsed game stream.
    """
    return (
        events.select("user", "score")
        .groupBy("user")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotalsProcessor(),
            outputStructType=TOTALS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
