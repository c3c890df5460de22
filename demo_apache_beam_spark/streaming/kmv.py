"""Streaming KMV distinct sketches — live audience-overlap monitoring.

The streaming face of ``operators/sketches.py:kmv_sketches``: each
micro-batch contributes its own per-key bottom-k sketch (≤ k rows per
key), written under a ``_batch_id`` partition with dynamic partition
overwrite (the engine's replay-idempotence pattern — ``streaming/
dedup.py``, ``streaming/sketches.py``), and the live view re-ranks the
union of epoch sketches on READ.

Unlike the Misra-Gries store, the KMV merge is EXACT: the bottom-k of
a union of bottom-k sketches is the union's bottom-k (any hash among
the union's k smallest is among its own epoch's k smallest), so the
streaming store reconstructs bit-for-bit the sketch a batch pass over
the full history would build — stream == batch with no extra error
term, and ``kmv_pair_estimates`` over the store gives the same
Jaccard/union/intersection estimates the batch query would. Per-epoch
store cost is ≤ k·|keys| rows; the read-side fold is a rank window
over epochs × k rows per key — never a history re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import kmv_sketches, rank_bottom_k


def make_kmv_ingest(
    spark,
    store_path: str,
    key_col: str,
    item_col: str,
    k: int = 32,
    seed: str = "kmv1",
):
    """The foreachBatch callable: sketch the batch, write ≤ k rows per
    key under this epoch's partition (replay-safe overwrite)."""
    from .idempotent import write_windowed_idempotent

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sk = kmv_sketches(batch_df, key_col, item_col, k=k, seed=seed)
        write_windowed_idempotent(
            sk.select(key_col, "hx").withColumn("_batch_id", F.lit(batch_id)),
            store_path,
            partition_col="_batch_id",
        )

    return ingest


def read_kmv_store(spark, store_path: str, key_col: str, k: int = 32) -> DataFrame:
    """The live sketch: distinct epoch hashes re-ranked to the exact
    whole-history bottom-k (see ``rank_bottom_k`` on why this is exact).
    Feed the result to ``kmv_pair_estimates`` for live overlap."""
    rows = spark.read.parquet(store_path).select(key_col, "hx").distinct()
    return rank_bottom_k(rows, key_col, k)


def start_kmv_stream(
    spark,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    key_col: str,
    item_col: str,
    k: int = 32,
    seed: str = "kmv1",
    schema: str | None = None,
):
    """Maintain a live per-key KMV store over a file stream."""
    stream = spark.readStream.schema(
        schema or f"{key_col} string, {item_col} string"
    ).parquet(input_dir)
    ingest = make_kmv_ingest(
        spark, store_path, key_col, item_col, k=k, seed=seed
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
