"""Custom stateful streaming operators (``applyInPandasWithState``).

The reference has no stateful DoFns (SURVEY.md §2.9 — no @StateId/timers),
but Beam users reach for them the moment a computation isn't a windowed
aggregate; the Spark equivalent is arbitrary per-key state via
``applyInPandasWithState``. This module provides the canonical example:
per-user scoring streaks — "how many consecutive events scored ≥ T" — a
computation no windowed aggregate expresses because the result depends on
the *order* and *adjacency* of events, not their bucket.

State design (the 100 TB posture):

- state per key is three scalars (current streak, longest streak, last
  event-time seen) — constant memory per user regardless of history;
- rows are processed in event-time order *within* each micro-batch;
  cross-batch order is arrival order, which matches event order for an
  in-order source and degrades gracefully (documented, and exactly what a
  Beam stateful DoFn without holds does);
- state lives in the executor state store (RocksDB at scale), keyed by
  user — the same layout as the windowed aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STREAK_OUTPUT = StructType(
    [
        StructField("user", StringType()),
        StructField("current_streak", IntegerType()),
        StructField("longest_streak", IntegerType()),
        StructField("n_events", LongType()),
    ]
)

STREAK_STATE = StructType(
    [
        StructField("current", IntegerType()),
        StructField("longest", IntegerType()),
        StructField("n_events", LongType()),
    ]
)


def user_score_streaks(
    events: DataFrame, threshold: int = 10
) -> DataFrame:
    """Per-user streaks of consecutive events with ``score ≥ threshold``.

    Emits one row per user per micro-batch with the running current and
    longest streak plus the total events seen — accumulating semantics,
    like the update-mode aggregates.

    ``events`` must carry (user, score, event_time) — the parsed game
    stream. Works identically on a batch DataFrame via
    ``applyInPandas``-style grouping in tests (feed all rows as one
    batch).
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            current, longest, n_events = state.get
        else:
            current, longest, n_events = 0, 0, 0
        # Materialize the WHOLE group before sorting: Arrow hands the group
        # over as multiple chunks (spark.sql.execution.arrow.maxRecordsPerBatch
        # rows each), and a per-chunk sort would interleave chunks in arrival
        # order — wrong exactly for hot keys whose batch spans chunks.
        chunks = list(pdfs)
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                "event_time", kind="stable"
            )
            hit = (pdf["score"].to_numpy() >= threshold)
            n_events += len(hit)
            breaks = np.flatnonzero(~hit)
            if len(breaks) == 0:
                current += len(hit)
                longest = max(longest, current)
            else:
                # run carried in from state + runs between misses + trailing run
                longest = max(longest, current + int(breaks[0]))
                if len(breaks) > 1:
                    longest = max(longest, int(np.diff(breaks).max()) - 1)
                current = int(len(hit) - breaks[-1] - 1)
                longest = max(longest, current)
        state.update((current, longest, n_events))
        yield pd.DataFrame(
            {
                "user": [key[0]],
                "current_streak": [current],
                "longest_streak": [longest],
                "n_events": [n_events],
            }
        )

    return (
        events.select("user", "score", "event_time")
        .groupBy("user")
        .applyInPandasWithState(
            update,
            outputStructType=STREAK_OUTPUT,
            stateStructType=STREAK_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
