"""Streaming joins — stream-stream interval joins and stream-static
enrichment.

The reference has a single input stream (SURVEY.md §2.1), so these are
extension operators; they are, however, the two join shapes every
production event pipeline needs:

- **stream-static**: enrich events with a dimension table. The static
  side is broadcast per micro-batch; no state, no watermark
  interaction. The dimension may be re-read per batch (picks up slowly
  changing dims) — at 100 TB scale the static side must stay
  broadcast-sized or be pre-bucketed on the join key.

- **stream-stream interval join**: match events from two streams on a
  key within an event-time window (attribution, request/response
  pairing). Both sides are watermarked and the join condition carries
  an explicit event-time bound — that bound is what lets Spark compute
  how long each side's state must live (left keeps rows until the
  right watermark passes ``left_time + max_lag``; without it, state
  grows forever). Inner joins emit as matches arrive; outer joins
  additionally emit NULL-padded rows once the watermark proves no
  match can come.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    dimension: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: per-micro-batch broadcast enrichment."""
    return stream.join(F.broadcast(dimension), on, how)


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    on: str,
    max_lag_minutes: int,
    watermark_minutes: int = 120,
    how: str = "inner",
    left_prefix: str = "l",
    right_prefix: str = "r",
) -> DataFrame:
    """Join two event streams on ``on`` where the right event happened in
    ``[left.event_time − max_lag, left.event_time]``.

    Both inputs must carry an ``event_time`` column. Output columns are
    prefixed (``<prefix>_<col>``) to keep the two sides distinguishable.
    State lifetime is bounded by ``watermark + max_lag`` on each side —
    the event-time bound in the join condition is mandatory for state
    cleanup in stream-stream joins.
    """
    l_cols = [F.col(c).alias(f"{left_prefix}_{c}") for c in left.columns]
    r_cols = [F.col(c).alias(f"{right_prefix}_{c}") for c in right.columns]
    lw = left.select(*l_cols).withWatermark(
        f"{left_prefix}_event_time", f"{int(watermark_minutes)} minutes"
    )
    rw = right.select(*r_cols).withWatermark(
        f"{right_prefix}_event_time", f"{int(watermark_minutes)} minutes"
    )
    cond = (
        (F.col(f"{left_prefix}_{on}") == F.col(f"{right_prefix}_{on}"))
        & (F.col(f"{right_prefix}_event_time") <= F.col(f"{left_prefix}_event_time"))
        & (
            F.col(f"{right_prefix}_event_time")
            >= F.col(f"{left_prefix}_event_time")
            - F.expr(f"INTERVAL {int(max_lag_minutes)} MINUTES")
        )
    )
    return lw.join(rw, cond, how)
