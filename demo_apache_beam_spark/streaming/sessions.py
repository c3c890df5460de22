"""Streaming session windows — per-key activity sessions that merge while
events keep arriving within an inactivity gap, and emit exactly once when
the watermark closes them.

An engine extension: the reference snapshot has no session windowing
(upstream Beam's GameStats uses ``Sessions`` but that file is absent —
SURVEY.md §2.4); the batch engine already ships gap-sessionization
(``operators/windows.py:session_window``, oracle query
``session_user_activity``). This module is the streaming side of the same
operator, built on Spark's native ``session_window`` aggregation:

- State: the state store keeps ONE in-progress (key, session) entry per
  active session, merging adjacent windows transitively as events arrive —
  no per-event state, so a hot key costs one row of state, not a buffer.
- Emission: append mode — a session emits exactly once, when the event-time
  watermark (arrival horizon = ``allowed_lateness_minutes``, mirroring the
  LeaderBoard's W5 horizon) passes ``session_end``; late events inside the
  horizon extend or merge sessions before they close, later ones are
  dropped by the same watermark rule as every other stateful operator.
- Scale: the aggregation shuffles once on the grouping key; state is
  bounded by (active keys x open sessions), independent of event volume.

Stream/batch parity: closed sessions equal the batch ``session_window``
aggregate over the same rows (``test_streaming_sessions_equal_batch``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    allowed_lateness_minutes: int = 120,
    key_col: str = "user",
    time_col: str = "event_time",
) -> DataFrame:
    """Per-key session aggregation over an unbounded event stream.

    ``events`` is the parsed game-event stream (any of the leaderboard
    wire formats): at minimum ``(key_col, score, time_col)``. Returns the
    closed-session relation ``(key, session_start, session_end,
    total_score, n_events)`` — ``session_end`` is last event + gap, the
    same boundary the batch operator and the gaps-and-islands oracle
    produce.
    """
    return (
        events.withWatermark(time_col, f"{int(allowed_lateness_minutes)} minutes")
        .groupBy(
            F.session_window(F.col(time_col), f"{int(gap_minutes)} minutes"),
            F.col(key_col),
        )
        .agg(
            F.sum("score").cast("long").alias("total_score"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "total_score",
            "n_events",
        )
    )


def sessionize_batch(
    events: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user",
    time_col: str = "event_time",
) -> DataFrame:
    """The batch twin: identical plan minus the watermark — used by the
    stream==batch equivalence test and by backfills that must agree with
    what the stream emitted."""
    return (
        events.groupBy(
            F.session_window(F.col(time_col), f"{int(gap_minutes)} minutes"),
            F.col(key_col),
        )
        .agg(
            F.sum("score").cast("long").alias("total_score"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "total_score",
            "n_events",
        )
    )
