"""W1/W2/W3 — event-time assignment and tumbling windows.

Beam hides event time and windows in element metadata (``WithTimestamps``
at HourlyTeamScore.java:88-89; ``FixedWindows`` at :90-91). Spark makes both
explicit columns — ``event_time: timestamp`` and
``window: struct<start,end>`` — which is the cleaner model (SURVEY.md §1.4).
``F.window`` windows are epoch-aligned tumbling buckets, identical to Beam's
``FixedWindows`` default (no offset used by the reference).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, millis_col: str = "timestamp", out_col: str = "event_time") -> DataFrame:
    """W1: epoch-millis long → TimestampType event-time column
    (HourlyTeamScore.java:88-89)."""
    return df.withColumn(out_col, F.timestamp_millis(F.col(millis_col)))


def tumbling_window(minutes: int, time_col: str = "event_time") -> Column:
    """W2: fixed (tumbling) event-time window of ``minutes`` duration
    (HourlyTeamScore.java:90-91; LeaderBoard.java:190-191; default 60)."""
    return F.window(F.col(time_col), f"{int(minutes)} minutes")


def sliding_window(
    minutes: int, slide_minutes: int, time_col: str = "event_time"
) -> Column:
    """Sliding (hopping) event-time windows — an engine extension; the
    reference uses none (SURVEY.md §2.4 'not present'), but Beam's
    ``SlidingWindows`` maps 1:1 onto ``F.window`` with a slide. Each event
    lands in ``minutes / slide_minutes`` overlapping buckets; the expansion
    happens executor-side inside the aggregate, never as a materialized
    row blowup before partial aggregation."""
    return F.window(
        F.col(time_col), f"{int(minutes)} minutes", f"{int(slide_minutes)} minutes"
    )


def session_window(gap_minutes: int, time_col: str = "event_time") -> Column:
    """Session windows with a ``gap_minutes`` inactivity gap — an engine
    extension (upstream Beam's GameStats uses ``Sessions``; the snapshot
    doesn't, SURVEY.md §2.4). Spark merges per-key windows transitively in
    the aggregation — state-store backed in streaming, sort-based in
    batch; session end = last event + gap."""
    return F.session_window(F.col(time_col), f"{int(gap_minutes)} minutes")
