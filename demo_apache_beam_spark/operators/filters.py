"""F1/F2 — event-time range filters (HourlyTeamScore.java:82-87).

Both bounds are **strictly exclusive** in the reference
(``timestamp > startMin`` / ``timestamp < stopMin``); preserved exactly for
oracle parity. At scale these predicates push down to the Parquet scan
(row-group min/max pruning) because they are plain column comparisons.
"""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: The reference parses bounds as ``yyyy-MM-dd-HH-mm`` in PST
#: (HourlyTeamScore.java:27-32) with epoch / year-2100 defaults (:44,:51).
BOUND_FORMAT = "%Y-%m-%d-%H-%M"
DEFAULT_START = "1970-01-01-00-00"
DEFAULT_STOP = "2100-01-01-00-00"


def parse_bound(bound: str, tz: timezone = timezone.utc) -> int:
    """CLI bound string → epoch millis. The engine standardizes on UTC
    (the reference's hardcoded PST is a deployment detail, not a semantic)."""
    return int(datetime.strptime(bound, BOUND_FORMAT).replace(tzinfo=tz).timestamp() * 1000)


def filter_time_range(
    events: DataFrame,
    time_col: Column | str,
    start_ms: int | None = None,
    stop_ms: int | None = None,
) -> DataFrame:
    """Keep rows with start < t < stop (exclusive both sides, F1/F2)."""
    col = F.col(time_col) if isinstance(time_col, str) else time_col
    if start_ms is not None:
        events = events.filter(col > F.lit(start_ms))
    if stop_ms is not None:
        events = events.filter(col < F.lit(stop_ms))
    return events
