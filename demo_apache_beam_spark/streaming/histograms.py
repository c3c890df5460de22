"""Streaming mergeable-histogram quantile monitor.

The streaming face of ``queries.py:value_quantile_rollup``: each
micro-batch collapses to its per-key fixed-bin value histogram (≤
keys × n_bins rows), written under a ``_batch_id`` partition with
dynamic partition overwrite (the engine's replay-idempotence pattern —
``streaming/kmv.py``, ``streaming/sketches.py``), and the live
dashboard read merges the epoch partials and takes p50/p90/p99 upper
bounds off the cumulative sum.

Like KMV (and unlike Misra–Gries), the merge is EXACT: fixed-bin
counts are a commutative monoid, so the merged store reproduces
bit-for-bit the histogram a batch pass over the full history would
build — stream == batch with no extra error term; quantile error stays
the bin width by construction. Per-epoch store cost is ≤ keys × n_bins
rows however large the epoch; the read-side fold is a sum over
epochs × bins — never a history re-scan. This is the latency-dashboard
pattern at 100 TB: raw events are touched exactly once, on arrival.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def batch_value_histogram(
    df: DataFrame,
    key_col: str,
    value_col: str,
    bin_width: float = 10.0,
    n_bins: int = 64,
) -> DataFrame:
    """Per-key fixed-bin histogram: (key, bin, c) with bin = min(
    floor(value / bin_width), n_bins - 1) — the last bin absorbs the
    tail so the sketch is bounded regardless of outliers."""
    if n_bins < 2:
        raise ValueError(f"n_bins must be >= 2, got {n_bins}")
    b = (
        F.least(F.floor(F.col(value_col) / F.lit(bin_width)), F.lit(n_bins - 1))
        .cast("int")
        .alias("bin")
    )
    return (
        df.select(F.col(key_col).alias(key_col), b)
        .groupBy(key_col, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def histogram_quantile_readout(
    hist: DataFrame,
    key_col: str,
    bin_width: float = 10.0,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """p-quantile UPPER BOUNDS from a merged (key, bin, c) histogram:
    the right edge of the first bin whose cumulative count reaches
    q·n. Error ≤ bin_width by construction; deterministic integer
    arithmetic, so readouts are comparable across engines."""
    wc = Window.partitionBy(key_col).orderBy("bin")
    wn = Window.partitionBy(key_col)
    cum = hist.withColumn("cum", F.sum("c").over(wc)).withColumn(
        "n", F.sum("c").over(wn)
    )
    aggs = [F.max("n").alias("n_events")]
    for q in qs:
        name = f"p{int(round(q * 100))}_ub"
        aggs.append(
            F.min(
                F.when(
                    F.col("cum") >= F.lit(q) * F.col("n"),
                    (F.col("bin") + 1) * F.lit(bin_width),
                )
            ).alias(name)
        )
    return cum.groupBy(key_col).agg(*aggs)


def make_histogram_ingest(
    spark,
    store_path: str,
    key_col: str,
    value_col: str,
    bin_width: float = 10.0,
    n_bins: int = 64,
):
    """The foreachBatch callable: histogram the batch, write ≤
    keys × n_bins rows under this epoch's partition (replay-safe
    overwrite)."""
    from .idempotent import write_windowed_idempotent

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hist = batch_value_histogram(
            batch_df, key_col, value_col, bin_width=bin_width, n_bins=n_bins
        )
        write_windowed_idempotent(
            hist.withColumn("_batch_id", F.lit(batch_id)),
            store_path,
            partition_col="_batch_id",
        )

    return ingest


def read_histogram_store(spark, store_path: str, key_col: str) -> DataFrame:
    """The live merged histogram: epoch partials summed per (key, bin).
    Feed the result to ``histogram_quantile_readout`` for the dashboard
    row."""
    return (
        spark.read.parquet(store_path)
        .groupBy(key_col, "bin")
        .agg(F.sum("c").alias("c"))
    )


def start_histogram_stream(
    spark,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    key_col: str,
    value_col: str,
    bin_width: float = 10.0,
    n_bins: int = 64,
    schema: str | None = None,
):
    """Maintain a live per-key quantile histogram over a file stream."""
    stream = spark.readStream.schema(
        schema or f"{key_col} string, {value_col} double"
    ).parquet(input_dir)
    ingest = make_histogram_ingest(
        spark, store_path, key_col, value_col,
        bin_width=bin_width, n_bins=n_bins,
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
