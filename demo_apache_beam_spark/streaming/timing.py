"""W8 — pane-timing annotation (EARLY / ON_TIME / LATE).

The reference records each firing's pane timing in its output rows
(``c.pane().getTiming()``, LeaderBoard.java:101-104). Spark has no pane
metadata, but the same classification is derivable in the sink
(SURVEY.md §4.3):

- a row emitted while ``watermark < window_end`` is an **EARLY** (speculative)
  firing;
- the first emission at-or-after the watermark passed the window end is
  **ON_TIME**;
- any further emission for that (key, window) is **LATE** (a refinement
  triggered by late data inside the lateness horizon).

The watermark comes from the streaming progress feed (a
``StreamingQueryListener``); within a micro-batch it is the same value the
engine used to gate state, so the classification matches Beam's up to
Spark's batch-granular watermark advancement (documented delta, SURVEY.md
§2.4 W4). "First emission" is tracked by reading the sink table itself —
fully distributed, no driver-side key set: at scale the sink is a
warehouse table and the marker read is one aggregate over it.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class _WatermarkListener(StreamingQueryListener):
    def __init__(self, query_name: str, holder: "TimingAnnotator") -> None:
        self._query_name = query_name
        self._holder = holder

    def onQueryStarted(self, event) -> None:  # pragma: no cover - interface
        pass

    def onQueryProgress(self, event) -> None:
        progress = event.progress
        if progress.name != self._query_name:
            return
        wm = (progress.eventTime or {}).get("watermark")
        if wm:
            self._holder.set_watermark(wm)

    def onQueryIdle(self, event) -> None:  # pragma: no cover - interface
        pass

    def onQueryTerminated(self, event) -> None:
        # Self-detach so no progress callback races the py4j bridge after
        # the consumer stops the query.
        self._holder.detach_on_terminate()


class TimingAnnotator:
    """Adds a ``timing`` column to windowed sink batches."""

    def __init__(self, sink_path: str) -> None:
        self._sink_path = sink_path
        self._watermark: str | None = None
        self._lock = threading.Lock()
        self._listener: _WatermarkListener | None = None

    def attach(self, spark: SparkSession, query_name: str) -> None:
        self._spark = spark
        self._listener = _WatermarkListener(query_name, self)
        spark.streams.addListener(self._listener)

    def detach(self, spark: SparkSession | None = None) -> None:
        spark = spark or getattr(self, "_spark", None)
        if self._listener is not None and spark is not None:
            spark.streams.removeListener(self._listener)
            self._listener = None

    def detach_on_terminate(self) -> None:
        try:
            self.detach()
        except Exception:  # bridge already closing — nothing left to leak
            pass

    def set_watermark(self, wm: str) -> None:
        with self._lock:
            self._watermark = wm

    def annotate(self, batch_df: DataFrame) -> DataFrame:
        with self._lock:
            wm = self._watermark
        wm_col = F.lit(wm).cast("timestamp") if wm else F.lit(None).cast("timestamp")
        early = wm_col.isNull() | (wm_col < F.col("window_end"))

        spark = batch_df.sparkSession
        try:
            emitted = (
                spark.read.parquet(self._sink_path)
                .filter(F.col("timing").isin("ON_TIME", "LATE"))
                .select("team", "window_end")
                .distinct()
                .withColumn("_seen", F.lit(True))
            )
        except Exception:  # first batch: sink table doesn't exist yet
            emitted = None

        if emitted is None:
            return batch_df.withColumn(
                "timing", F.when(early, F.lit("EARLY")).otherwise(F.lit("ON_TIME"))
            )
        joined = batch_df.join(
            F.broadcast(emitted), ["team", "window_end"], "left"
        )
        return joined.withColumn(
            "timing",
            F.when(early, F.lit("EARLY"))
            .when(F.col("_seen").isNull(), F.lit("ON_TIME"))
            .otherwise(F.lit("LATE")),
        ).drop("_seen")
