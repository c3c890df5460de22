"""W8 — pane-timing annotation (EARLY / ON_TIME / LATE).

The reference records each firing's pane timing in its output rows
(``c.pane().getTiming()``, LeaderBoard.java:101-104). Spark has no pane
metadata, but the same classification is derivable in the sink
(SURVEY.md §4.3):

- a row emitted while ``beam_watermark < window_end`` is an **EARLY**
  (speculative) firing;
- the first emission at-or-after the watermark passed the window end is
  **ON_TIME**;
- any further emission for that (key, window) is **LATE** (a refinement
  triggered by late data inside the lateness horizon).

**The watermark that classifies panes is Beam's, not Spark's delayed
one.** The leaderboard declares ``withWatermark(event_time, lateness)``,
so Spark's internal watermark is ``max_event_time − lateness`` and state
for a window is evicted once ``spark_wm ≥ window_end`` — which is
*exactly* Beam's drop horizon ``beam_wm ≥ window_end + lateness`` under
a perfect watermark (``beam_wm = max_event_time``). Classifying against
``spark_wm`` directly would label every admitted row EARLY (a row can
only be admitted while ``spark_wm < window_end``); the pane boundary
Beam defines is ``beam_wm = spark_wm + lateness`` vs window end. This
delay/lateness identification is what makes the whole Beam triggering
model land on Spark update mode losslessly:

====================  =========================================
Beam                  Spark (update mode, delay = lateness)
====================  =========================================
EARLY pane            emission while ``spark_wm + lateness < end``
ON_TIME pane          first emission with ``spark_wm + lateness ≥ end``
LATE pane             later emissions, until state eviction
drop after lateness   eviction at ``spark_wm ≥ end``
====================  =========================================

Two design points, both scale-critical:

- **Watermark is read synchronously** from the query's ``lastProgress``
  inside ``foreachBatch``. The progress published at the end of batch
  N-1 carries exactly the watermark the engine uses to gate batch N's
  state, so the classification matches what the state store did — an
  async listener (the round-1 design) could lag a batch and mislabel
  panes.
- **First-emission markers live in their own compact table** (sibling
  ``<sink>_markers`` path), not in the ever-growing data sink. Each
  batch appends only the (key, window_end) pairs that just fired
  ON_TIME — a pair is appended exactly once — and reads are pruned to
  windows the engine can still emit (``window_end > spark_wm``; at
  eviction the window can never fire again, its marker is dead). A
  periodic compaction rewrites the table down to the live set, which is
  O(open windows), not O(sink history).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MARKER_SCHEMA = T.StructType(
    [
        T.StructField("team", T.StringType()),
        T.StructField("window_end", T.TimestampType()),
    ]
)


class TimingAnnotator:
    """Adds a ``timing`` column to windowed sink batches.

    Usage inside ``foreachBatch``::

        out = annotator.annotate(batch_df)
        out.write.mode("append").parquet(sink)
        annotator.record(out, epoch_id)
    """

    def __init__(
        self,
        sink_path: str,
        allowed_lateness_minutes: int = 120,
        compact_every: int = 64,
    ) -> None:
        self._markers_path = f"{sink_path}_markers"
        self._lateness_min = int(allowed_lateness_minutes)
        self._compact_every = int(compact_every)
        self._query_name: str | None = None
        self._spark: SparkSession | None = None

    def attach(self, spark: SparkSession, query_name: str) -> None:
        self._spark = spark
        self._query_name = query_name

    def detach(self, spark: SparkSession | None = None) -> None:
        self._query_name = None

    # -- watermark ---------------------------------------------------------

    def _current_watermark(self, spark: SparkSession) -> str | None:
        """The previous batch's published watermark — the exact value the
        engine used to gate this batch's state updates.

        The lookup runs against the session ``attach()`` captured, NOT the
        micro-batch DataFrame's session: ``foreachBatch`` hands its batch a
        cloned session whose StreamingQueryManager lists no active queries,
        so resolving through it silently yields None (= everything EARLY).
        """
        spark = self._spark or spark
        if self._query_name is None:
            return None
        for q in spark.streams.active:
            if q.name == self._query_name:
                progress = q.lastProgress
                if progress:
                    return (progress.get("eventTime") or {}).get("watermark")
                return None
        return None

    # -- markers -----------------------------------------------------------

    def _live_markers(self, spark: SparkSession, wm_col) -> DataFrame | None:
        # cheap existence probe for local paths so the reader doesn't log a
        # WARN + FileNotFoundException on every pre-marker batch
        if "://" not in self._markers_path and not os.path.exists(self._markers_path):
            return None
        try:
            markers = spark.read.schema(_MARKER_SCHEMA).parquet(self._markers_path)
        except Exception:  # remote path that doesn't exist yet
            return None
        # a window is evicted from state once spark_wm ≥ window_end and can
        # never fire again — its marker is dead weight, prune on read
        if wm_col is not None:
            markers = markers.filter(F.col("window_end") > wm_col)
        return markers.distinct().withColumn("_seen", F.lit(True))

    def annotate(self, batch_df: DataFrame) -> DataFrame:
        spark = batch_df.sparkSession
        wm = self._current_watermark(spark)
        wm_col = F.lit(wm).cast("timestamp") if wm else None
        # Beam's pane boundary: beam_wm (= spark_wm + lateness, see module
        # docstring) vs window end
        early = (
            F.lit(True)
            if wm_col is None
            else (
                wm_col + F.expr(f"INTERVAL {self._lateness_min} MINUTES")
                < F.col("window_end")
            )
        )

        emitted = self._live_markers(spark, wm_col)
        if emitted is None:
            return batch_df.withColumn(
                "timing", F.when(early, F.lit("EARLY")).otherwise(F.lit("ON_TIME"))
            )
        joined = batch_df.join(F.broadcast(emitted), ["team", "window_end"], "left")
        if wm_col is None:
            # query restart: lastProgress is gone but the marker table
            # survives — a window whose ON_TIME marker exists has fired,
            # so this emission is a LATE refinement, not EARLY
            return joined.withColumn(
                "timing",
                F.when(F.col("_seen").isNull(), F.lit("EARLY")).otherwise(
                    F.lit("LATE")
                ),
            ).drop("_seen")
        return joined.withColumn(
            "timing",
            F.when(early, F.lit("EARLY"))
            .when(F.col("_seen").isNull(), F.lit("ON_TIME"))
            .otherwise(F.lit("LATE")),
        ).drop("_seen")

    def record(self, annotated_df: DataFrame, epoch_id: int) -> None:
        """Append this batch's first ON_TIME firings to the marker table.

        Each (team, window_end) lands at most once across the stream's
        lifetime (later firings classify LATE and are not re-recorded), so
        the table grows by closed windows only; compaction keeps the file
        set bounded by the live window count.
        """
        new_markers = (
            annotated_df.filter(F.col("timing") == "ON_TIME")
            .select("team", "window_end")
            .distinct()
        )
        new_markers.write.mode("append").parquet(self._markers_path)
        if self._compact_every and (epoch_id + 1) % self._compact_every == 0:
            self._compact(annotated_df.sparkSession)

    def _compact(self, spark: SparkSession) -> None:
        """Rewrite the marker table down to its live set. The live set is
        O(open windows) — bounded by lateness × key cardinality — so the
        driver round-trip is a metadata-sized operation."""
        wm = self._current_watermark(spark)
        wm_col = F.lit(wm).cast("timestamp") if wm else None
        live = self._live_markers(spark, wm_col)
        if live is None:
            return
        rows = live.select("team", "window_end").collect()
        spark.createDataFrame(rows, _MARKER_SCHEMA).write.mode("overwrite").parquet(
            self._markers_path
        )
