"""Live windowed top-k leaderboard view — the product-facing read side of
the LeaderBoard pipeline (the reference renders "top teams right now";
its pipeline only materializes all totals and leaves ranking to the
dashboard — this operator closes that gap).

Design: ranking inside the streaming aggregation would need a windowed
rank over an updating aggregate — not expressible as one streaming plan
(Spark disallows chained stateful aggregations in update mode). The
standard shape is CQRS: the update-mode totals stream upserts a compact
(window, team) → score store in ``foreachBatch`` (exactly the K4 table
sink), and the top-k view ranks the store on read. State is
one row per live (window, team) — watermark-bounded — and each
micro-batch touches only changed keys; the rank runs over a
dashboard-sized store, never the event stream.
"""

from __future__ import annotations

import heapq
from threading import Lock

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


class WindowedTopKView:
    """In-memory upsert store + top-k reader for (window, team) totals.

    The in-memory dict stands in for the K4 table sink of a production
    deployment (same upsert contract); a Lock guards the micro-batch
    writer vs dashboard readers. ``topk`` ties break lexicographically on
    team for determinism.
    """

    def __init__(self, k: int = 3):
        self.k = int(k)
        self._totals: dict[tuple[str, str], int] = {}
        self._lock = Lock()

    def upsert_batch(self, batch_df: DataFrame) -> None:
        rows = batch_df.select("window_start", "team", "total_score").collect()
        with self._lock:
            for r in rows:
                self._totals[(str(r["window_start"]), r["team"])] = r["total_score"]

    def topk(self) -> dict[str, list[tuple[str, int]]]:
        """window_start → [(team, total_score)] best-first, ≤ k entries."""
        with self._lock:
            per_window: dict[str, list[tuple[int, str]]] = {}
            for (w, team), score in self._totals.items():
                per_window.setdefault(w, []).append((score, team))
        return {
            w: [
                (team, score)
                for score, team in heapq.nsmallest(
                    self.k, entries, key=lambda e: (-e[0], e[1])
                )
            ]
            for w, entries in per_window.items()
        }


def start_windowed_topk(
    team_scores: DataFrame,
    checkpoint_dir: str,
    k: int = 3,
) -> tuple[StreamingQuery, WindowedTopKView]:
    """Attach a live top-k view to an update-mode windowed team-score
    stream (``calculate_team_scores`` output). Returns (query, view);
    read ``view.topk()`` at any time for the current leaderboard."""
    view = WindowedTopKView(k)
    query = (
        team_scores.writeStream.outputMode("update")
        .foreachBatch(lambda df, _epoch: view.upsert_batch(df))
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
    return query, view
