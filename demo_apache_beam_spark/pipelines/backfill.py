"""Windowed-table backfill — batch recompute of an event-time range,
written through the idempotent partition-overwrite sink.

The operational complement to the streaming LeaderBoard: when logic
changes or late data lands beyond the watermark horizon, the affected
window range is recomputed from the raw events and swapped into the SAME
windowed table the stream maintains (`streaming/idempotent.py`), touching
only the partitions inside the range. Because the batch aggregate and the
streaming aggregate share one definition (`windowed_sum_scores` — the
stream==batch equivalence the tests pin), a backfilled partition is
byte-identical to what an on-time stream would have produced: the
"kappa-style" reprocessing story with no second codepath.

At 100 TB the time-range filter prunes the source scan (pushdown-tested
F1/F2 bounds) and dynamic partition overwrite rewrites only the windows in
range — cost scales with the backfill span, never the table.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import windowed_sum_scores
from ..operators.filters import parse_bound
from ..operators.parse import parse_game_events
from ..operators.windows import with_event_time
from ..streaming.idempotent import write_windowed_idempotent


def backfill_team_windows(
    lines: DataFrame,
    start_ms: int,
    stop_ms: int,
    window_minutes: int = 60,
) -> DataFrame:
    """Recompute per-team tumbling-window totals for [start, stop).

    Deliberately HALF-OPEN (>= start, < stop), unlike the reference's
    strict F1/F2 bounds (`filter_time_range`): adjacent backfill ranges
    must tile the timeline with no gap, or an event landing exactly on a
    range boundary would vanish from both runs. Window-aligned bounds +
    half-open intervals give exactly-once ownership of every event.
    """
    events = parse_game_events(lines)
    events = events.filter(
        (F.col("timestamp") >= start_ms) & (F.col("timestamp") < stop_ms)
    )
    events = with_event_time(events)
    out = windowed_sum_scores(events, "team", window_minutes)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss.SSS").alias(
            "window_start"
        ),
        "team",
        "total_score",
    )


def run(
    spark: SparkSession,
    input_glob: str,
    output: str,
    start: str,
    stop: str,
    window_minutes: int = 60,
) -> None:
    lines = spark.read.text(input_glob)
    result = backfill_team_windows(
        lines, parse_bound(start), parse_bound(stop), window_minutes
    )
    write_windowed_idempotent(result, output)


def main(argv: list[str] | None = None) -> None:
    from ..session import get_spark

    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--start", required=True, help="inclusive, yyyy-MM-dd-HH-mm")
    p.add_argument("--stop", required=True, help="exclusive, yyyy-MM-dd-HH-mm")
    p.add_argument("--window-duration", type=int, default=60)
    opts = p.parse_args(argv)
    run(
        get_spark("backfill"),
        opts.input,
        opts.output,
        opts.start,
        opts.stop,
        opts.window_duration,
    )


if __name__ == "__main__":
    main()
