"""Streaming observability — the stream-side completion of the reference's
metrics surface (M1 ParseErrors counter, M2 pipeline wait): summarize a
running StreamingQuery's progress the way an operator dashboard needs it.

Structured Streaming already emits a progress JSON per micro-batch
(rows/sec, batch durations, per-operator state-store sizes, current
watermark); this module reduces that to a stable, typed snapshot — the
numbers a 1000-executor deployment alerts on (input vs processed rate =
backpressure, watermark lag = late-data exposure, state rows = memory
trajectory). Pure driver-side metadata: reading it never touches
executors or data.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.streaming import StreamingQuery


@dataclass(frozen=True)
class StreamHealth:
    """One micro-batch's operational summary."""

    batch_id: int | None
    input_rows_per_sec: float
    processed_rows_per_sec: float
    num_input_rows: int
    batch_duration_ms: int | None
    watermark_ms: int | None  # epoch millis; None before first watermark
    state_rows: int
    state_bytes: int

    @property
    def keeping_up(self) -> bool:
        """Processing at least as fast as data arrives (no backpressure)."""
        return self.processed_rows_per_sec >= self.input_rows_per_sec

    def watermark_lag_ms(self, now_ms: int) -> int | None:
        """How far event-time completeness trails wall time."""
        return None if self.watermark_ms is None else now_ms - self.watermark_ms


def _parse_ts_ms(ts: str | None) -> int | None:
    if not ts or ts.startswith("1970-01-01T00:00:00"):
        return None  # unset watermark sentinel
    dt = datetime.fromisoformat(ts.replace("Z", "+00:00"))
    return int(dt.astimezone(timezone.utc).timestamp() * 1000)


def stream_health(query: StreamingQuery) -> StreamHealth | None:
    """Snapshot the query's most recent progress; None before the first
    completed micro-batch."""
    p = query.lastProgress
    if not p:
        return None
    state_rows = sum(
        int(op.get("numRowsTotal", 0)) for op in p.get("stateOperators", [])
    )
    state_bytes = sum(
        int(op.get("memoryUsedBytes", 0)) for op in p.get("stateOperators", [])
    )
    durations = p.get("durationMs", {}) or {}
    return StreamHealth(
        batch_id=p.get("batchId"),
        input_rows_per_sec=float(p.get("inputRowsPerSecond") or 0.0),
        processed_rows_per_sec=float(p.get("processedRowsPerSecond") or 0.0),
        num_input_rows=int(p.get("numInputRows") or 0),
        batch_duration_ms=durations.get("triggerExecution"),
        watermark_ms=_parse_ts_ms((p.get("eventTime") or {}).get("watermark")),
        state_rows=state_rows,
        state_bytes=state_bytes,
    )
