"""Streaming right-to-erasure propagation — apply a deletion-request
(tombstone) stream to a persisted dataset as requests arrive.

The streaming face of ``operators/layout.py:erase_rows`` (whose batch
dry-run is ``user_erasure_audit``): each micro-batch of requested ids
is one erasure pass over the dataset. Compliance clocks (GDPR art. 17's
"undue delay") make this a continuously-running job in production, not
a monthly batch.

Replay idempotence comes from the operator's own semantics rather than
epoch partitioning: re-delivering a tombstone batch re-probes with ids
whose rows are already gone, every partition's semi-join count is 0,
and ``erase_rows`` skips every rewrite — the dataset's files are
untouched byte-for-byte. (Contrast the ``_batch_id`` stores: those need
partition overwrite because their writes ADD state; deletion is
naturally convergent.) Per-epoch cost is the probe scan plus rewrites
of only the partitions that actually contain requested rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.layout import erase_rows


def make_erasure_ingest(
    spark,
    dataset_path: str,
    key_col: str,
    id_col: str | None = None,
    sort_col: str | None = None,
):
    """The foreachBatch callable: erase this batch's requested ids from
    the dataset. Batches are serialized by the engine, so rewrites
    never race."""

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        erase_rows(
            spark, dataset_path, batch_df, key_col,
            id_col=id_col, sort_col=sort_col,
        )

    return ingest


def start_erasure_stream(
    spark,
    input_dir: str,
    dataset_path: str,
    checkpoint_dir: str,
    key_col: str,
    id_col: str | None = None,
    sort_col: str | None = None,
    schema: str | None = None,
):
    """Apply a parquet tombstone stream (one column of requested ids)
    to the dataset at ``dataset_path``."""
    stream = spark.readStream.schema(
        schema or f"{id_col or key_col} long"
    ).parquet(input_dir)
    ingest = make_erasure_ingest(
        spark, dataset_path, key_col, id_col=id_col, sort_col=sort_col
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
