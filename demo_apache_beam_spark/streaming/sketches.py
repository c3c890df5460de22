"""Streaming heavy hitters — the Misra-Gries summary maintained over an
unbounded stream (the streaming face of ``operators/sketches.py``, and
the reason the sketch has to be MERGEABLE in the first place: each
micro-batch contributes one bounded summary, and the live "top talkers"
view is a fold over summaries — never a re-scan of history).

Store layout follows the engine's replay-idempotence pattern
(``streaming/dedup.py``, ``streaming/vector_search.py``): each epoch
writes its OWN batch summary (≤ k-1 rows) under a ``_batch_id``
partition with dynamic partition overwrite, so an at-least-once
redelivery rewrites the same partition with the same rows instead of
double-counting — merging is not idempotent, so the merge happens on
READ (a fold over epochs × k rows, driver-trivial), not on write.

Error composition over the full pipeline: per-batch distributed sketch
≤ 2·N_b/k (partition pass + per-batch fold, see the batch operator's
docstring), summing to ≤ 2N/k across batches; the read-side fold adds
≤ N/k — so the streaming view satisfies
``count_lo ≤ true ≤ count_lo + 3N/k``, and every item with true
frequency above 3N/k is guaranteed present. Pick k accordingly
(k = 3/φ for support threshold φ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def make_heavy_hitters_ingest(
    spark,
    store_path: str,
    item_col: str,
    k: int = 64,
    weight_col: str | None = None,
):
    """The foreachBatch callable: sketch the batch, write the ≤ k-1
    summary rows under this epoch's partition (replay-safe overwrite)."""
    from pyspark.sql import functions as F

    from ..operators.sketches import heavy_hitters
    from .idempotent import write_windowed_idempotent

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        summary = heavy_hitters(batch_df, item_col, k=k, weight_col=weight_col)
        if not summary:
            return
        rows = spark.createDataFrame(summary, "item string, w long")
        write_windowed_idempotent(
            rows.withColumn("_batch_id", F.lit(batch_id)),
            store_path,
            partition_col="_batch_id",
        )

    return ingest


def start_heavy_hitters_stream(
    spark,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    item_col: str,
    k: int = 64,
    weight_col: str | None = None,
    schema: str | None = None,
):
    """Maintain a live heavy-hitters store over a file stream. ``schema``
    defaults to a single string column named ``item_col``."""
    stream = spark.readStream.schema(
        schema or f"{item_col} string"
    ).parquet(input_dir)
    ingest = make_heavy_hitters_ingest(
        spark, store_path, item_col, k=k, weight_col=weight_col
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )


def read_heavy_hitters(spark, store_path: str, k: int = 64):
    """The queryable view: fold every epoch's summary into one
    ``[(item, count_lo), ...]`` list (descending). Reads epochs × k
    rows — metadata-sized regardless of how much data has streamed."""
    from pyspark.sql import functions as F

    from ..operators.sketches import _mg_merge

    # canonical fold order (epoch, count desc, item): the MG fold is
    # order-dependent in its near-zero tail, and a bare collect() returns
    # partitions in completion order — same store would yield different
    # tail survivors run to run otherwise
    rows = (
        spark.read.parquet(store_path)
        .orderBy("_batch_id", F.desc("w"), "item")
        .collect()
    )
    merged: dict = {}
    for r in rows:
        merged = _mg_merge(merged, {r["item"]: r["w"]}, k - 1)
    return sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))
