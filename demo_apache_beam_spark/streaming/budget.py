"""Streaming per-source budget enforcement — the ingestion-side face of
``queries.py:corpus_budget_fill``.

A crawl pipeline stops ACCEPTING a source once its cumulative weight
(tokens, chars, bytes) reaches the source's mixture cap; the decision
has to happen at ingestion time, not in a batch pass after the corpus
landed. Each micro-batch computes its rows' within-batch exclusive
prefix sums with the keyed two-pass scan
(``operators/packing.py:keyed_exclusive_prefix_sum`` — sources ×
range-slices parallelism, never one task per source), shifts them by
the per-source totals of all PREVIOUS epochs, and admits rows whose
shifted prior is still under the budget — exactly the sequential-writer
semantics of the batch query, so a stream whose epochs arrive in
``order_col`` order reproduces the batch answer bit-for-bit.

Replay idempotence (foreachBatch is at-least-once): admitted rows and
the per-source epoch totals both land under ``_batch_id`` partitions
with dynamic partition overwrite, and the offset read considers ONLY
partitions with ``_batch_id <`` the current epoch — a replayed epoch
sees exactly the history it saw the first time and rewrites exactly its
own partitions (the ``streaming/dedup.py`` contract). Per-epoch store
cost is O(sources) rows; the offset fold is a sum over epochs ×
sources — never a history re-scan of the admitted rows themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.packing import keyed_exclusive_prefix_sum


def make_budget_ingest(
    spark,
    out_dir: str,
    store_path: str,
    key_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
    num_partitions: int | None = None,
    prior_col: str = "prior",
):
    """The foreachBatch callable: admit this epoch's rows while their
    source's cumulative weight (previous epochs + within-batch prefix)
    stays under ``budget``; record the epoch's per-source totals."""
    from ..operators.dedup import _hadoop_path_exists
    from .idempotent import write_windowed_idempotent

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # One materialization serves the epoch's four consumers of the
        # batch input (the prefix-sum's bounds sample + totals collect
        # via its own projection cache, the admitted-rows write, the
        # per-source totals write). All of them complete eagerly inside
        # _ingest, so the release-invalidates-returned-plan hazard
        # documented in packing.py does not apply — the finally frees
        # the cache even on a failed epoch (streaming retries would
        # otherwise pin one copy per attempt).
        cached = False
        try:
            batch_df = batch_df.persist()
            cached = True
        except Exception:
            pass
        try:
            _ingest(batch_df, batch_id)
        finally:
            if cached:
                try:
                    batch_df.unpersist(False)
                except Exception:
                    pass

    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        local = keyed_exclusive_prefix_sum(
            batch_df, key_col, order_col, weight_col,
            num_partitions=num_partitions, out_col="__local",
        )
        if _hadoop_path_exists(spark, store_path):
            offsets = (
                spark.read.parquet(store_path)
                .filter(F.col("_batch_id") < F.lit(batch_id))
                .groupBy(key_col)
                .agg(F.sum("w_total").alias("__offset"))
            )
            local = local.join(F.broadcast(offsets), key_col, "left")
        else:
            local = local.withColumn("__offset", F.lit(None).cast("long"))
        admitted = (
            local.withColumn(
                prior_col,
                (F.col("__local") + F.coalesce(F.col("__offset"), F.lit(0)))
                .cast("long"),
            )
            .filter(F.col(prior_col) < F.lit(budget))
            .drop("__local", "__offset")
        )
        write_windowed_idempotent(
            admitted.withColumn("_batch_id", F.lit(batch_id)),
            out_dir,
            partition_col="_batch_id",
        )
        totals = (
            batch_df.groupBy(key_col)
            .agg(F.sum(weight_col).cast("long").alias("w_total"))
            .withColumn("_batch_id", F.lit(batch_id))
        )
        write_windowed_idempotent(
            totals, store_path, partition_col="_batch_id"
        )

    return ingest


def start_budget_stream(
    spark,
    input_dir: str,
    out_dir: str,
    store_path: str,
    checkpoint_dir: str,
    key_col: str,
    order_col: str,
    weight_col: str,
    budget: int,
    schema: str | None = None,
    num_partitions: int | None = None,
):
    """Enforce a per-key cumulative-weight budget over a parquet file
    stream; admitted rows land under ``out_dir`` by epoch."""
    stream = spark.readStream.schema(
        schema
        or f"{key_col} string, {order_col} long, {weight_col} long"
    ).parquet(input_dir)
    ingest = make_budget_ingest(
        spark, out_dir, store_path, key_col, order_col, weight_col,
        budget, num_partitions=num_partitions,
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
