"""HourlyTeamScore pipeline — batch, per-team totals in tumbling event-time
windows (reference entry point: HourlyTeamScore.main,
HourlyTeamScore.java:72-101).

Dataflow: read → parse (P1) → strict time-range filters (F1/F2) → event-time
assignment (W1) → 60-min tumbling windows + per-team sums (W2+A2) →
one output partition per window (K2, directory-per-window replaces the
reference's filename mangling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import windowed_sum_scores
from ..operators.filters import filter_time_range, parse_bound
from ..operators.parse import parse_game_events
from ..operators.windows import with_event_time
from ..functions.sinks import write_windowed_text


def run_on_lines(
    lines: DataFrame,
    window_minutes: int = 60,
    start_ms: int | None = None,
    stop_ms: int | None = None,
) -> DataFrame:
    events = parse_game_events(lines)
    events = filter_time_range(events, "timestamp", start_ms, stop_ms)
    events = with_event_time(events)
    out = windowed_sum_scores(events, "team", window_minutes)
    # K2/P3 output shape: formatted window_start string, deterministic
    # column order (FIXTURES.md §3).
    return out.select(
        "team",
        "total_score",
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss.SSS").alias("window_start"),
    )


def run(spark: SparkSession, input_glob: str, output: str, window_minutes: int = 60,
        start_min: str | None = None, stop_min: str | None = None) -> None:
    lines = spark.read.text(input_glob)
    start_ms = parse_bound(start_min) if start_min else None
    stop_ms = parse_bound(stop_min) if stop_min else None
    result = run_on_lines(lines, window_minutes, start_ms, stop_ms)
    write_windowed_text(result, output)


def main(argv: list[str] | None = None) -> None:
    from ..config import parse_hourly_args
    from ..session import get_spark

    opts = parse_hourly_args(argv)
    run(
        get_spark("hourly-team-score"),
        opts.input,
        opts.output,
        opts.window_duration,
        opts.start_min,
        opts.stop_min,
    )


if __name__ == "__main__":
    main()
