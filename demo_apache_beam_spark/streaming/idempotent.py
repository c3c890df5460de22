"""Idempotent windowed sink — exactly-once table output without a
transactional table format.

Structured Streaming's foreachBatch gives at-least-once batch delivery: on
recovery the last uncommitted epoch REPLAYS, so a plain ``mode("append")``
parquet sink (K3/K4) can double-write a batch. The standard fix without
Delta/Iceberg is to make the write idempotent: key the output layout on the
event-time window and OVERWRITE exactly the window partitions the batch
touches — replaying the epoch rewrites the same partitions with the same
rows instead of appending duplicates.

Spark-native mechanics: ``partitionOverwriteMode=dynamic`` scopes
``mode("overwrite")`` to only the partitions present in the written frame
(everything else is untouched), which is also the 100 TB story — a replayed
batch rewrites a handful of window directories, never the table. Correct
under the LeaderBoard's update-mode emission because each batch carries the
full accumulated state of every window it touches (so overwrite==upsert);
the same property holds for any watermark-complete append sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_windowed_idempotent(
    batch_df: DataFrame,
    path: str,
    partition_col: str = "window_start",
) -> None:
    """Overwrite exactly the ``partition_col`` partitions present in
    ``batch_df`` (dynamic partition overwrite); other partitions are
    untouched. Calling twice with the same batch is a no-op the second
    time — the replay contract foreachBatch needs for exactly-once."""
    spark = batch_df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        (
            batch_df.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
