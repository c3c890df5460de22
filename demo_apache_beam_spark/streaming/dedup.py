"""Streaming deduplication — the ingestion-side sibling of the batch
dedup operators (``operators/dedup.py``).

Two variants, matching Spark's two stateful-dedup contracts:

- :func:`dedup_event_stream` — **identity dedup**: the event-time column
  is part of the key, so state for a key is evicted as soon as the
  watermark passes its event time. Use when duplicates are exact replays
  (at-least-once sources re-delivering the same record). Stream output
  over any prefix of the input equals batch ``dropDuplicates`` over the
  same rows.

- :func:`dedup_event_stream_within_watermark` — **content dedup**: the
  key omits event time (a retransmission may carry a fresh timestamp);
  ``dropDuplicatesWithinWatermark`` keeps the first arrival and drops
  any duplicate whose key reappears within the watermark delay, evicting
  state afterwards. This is the unbounded-stream answer: per-key state
  lives O(watermark), not O(stream history).

At the 100 TB design point both run with RocksDB state stores; state
size is (keys in flight within the watermark horizon) × ~32 bytes — the
same budget as the windowed aggregates, far below the raw stream volume.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_event_stream(
    events: DataFrame,
    keys: Sequence[str] = ("user", "team", "score", "event_time"),
    allowed_lateness_minutes: int = 120,
) -> DataFrame:
    """Exact-replay dedup: first occurrence of each identity key passes,
    replays are dropped. ``event_time`` must be one of ``keys`` so the
    engine can evict state at the watermark (otherwise state grows with
    distinct keys forever — use the within-watermark variant instead).
    """
    keys = list(keys)
    if "event_time" not in keys:
        raise ValueError(
            "identity dedup requires event_time in the key for state "
            "eviction; use dedup_event_stream_within_watermark for "
            "content keys"
        )
    return events.withWatermark(
        "event_time", f"{int(allowed_lateness_minutes)} minutes"
    ).dropDuplicates(keys)


def dedup_event_stream_within_watermark(
    events: DataFrame,
    keys: Sequence[str] = ("user", "team", "score"),
    allowed_lateness_minutes: int = 120,
) -> DataFrame:
    """Content dedup with bounded state: duplicates of a key arriving
    within the watermark delay of the first arrival are dropped; the
    first-arriving row (with its timestamp) is the one emitted."""
    return events.withWatermark(
        "event_time", f"{int(allowed_lateness_minutes)} minutes"
    ).dropDuplicatesWithinWatermark(list(keys))
