"""Streaming Count-Min frequency store — live point-frequency
monitoring over an unbounded key stream.

The streaming face of ``operators/sketches.py:cms_estimates``: each
micro-batch contributes its own d×w cell-count sketch (≤ d·w rows per
epoch regardless of batch size), written under a ``_batch_id``
partition with dynamic partition overwrite (the engine's
replay-idempotence pattern — ``streaming/kmv.py``,
``streaming/histograms.py``), and the live sketch is the cell-wise SUM
of the epoch partials on read.

Like KMV and the fixed-bin histograms — and unlike Misra–Gries — the
merge is EXACT: cell counts are a commutative monoid, so the streaming
store reconstructs bit-for-bit the sketch a batch pass over the full
history would build; estimates off the store carry only the standard
CMS eps·N overestimate, no extra streaming error term. Per-epoch store
cost is ≤ d·w rows; the read-side fold is a sum over epochs × cells —
never a history re-scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import cms_hash_structs


def make_cms_ingest(
    spark,
    store_path: str,
    key_col: str,
    d: int = 4,
    w: int = 64,
):
    """The foreachBatch callable: sketch the batch, write ≤ d·w cell
    rows under this epoch's partition (replay-safe overwrite)."""
    from .idempotent import write_windowed_idempotent

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cells = (
            batch_df.select(
                F.explode(cms_hash_structs(F.col(key_col), d, w)).alias("x")
            )
            .select("x.i", "x.h")
            .groupBy("i", "h")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        write_windowed_idempotent(
            cells.withColumn("_batch_id", F.lit(batch_id)),
            store_path,
            partition_col="_batch_id",
        )

    return ingest


def read_cms_store(spark, store_path: str) -> DataFrame:
    """The live sketch: epoch cell partials summed per (i, h)."""
    return (
        spark.read.parquet(store_path)
        .groupBy("i", "h")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_store_estimates(
    spark,
    store_path: str,
    keys: DataFrame,
    key_col: str,
    d: int = 4,
    w: int = 64,
) -> DataFrame:
    """Point-frequency estimates for a table of probe keys against the
    live store: (key, n_cms) = min over the key's d cells. Keys absent
    from the whole history still report the (possibly positive) cell
    minimum — the standard CMS no-false-negative contract."""
    sketch = read_cms_store(spark, store_path)
    probe = keys.select(
        key_col, F.explode(cms_hash_structs(F.col(key_col), d, w)).alias("x")
    ).select(key_col, "x.i", "x.h")
    # LEFT join + coalesce-to-zero: a probe cell no streamed key ever
    # touched has NO sketch row, and an inner join would drop it —
    # returning a positive min for a never-seen key (or no row at all
    # when all its cells are empty) instead of the true estimate 0.
    # The batch operator's inner join is safe only because it probes
    # keys drawn from the sketched data itself.
    return (
        probe.join(F.broadcast(sketch), ["i", "h"], "left")
        .withColumn("cnt", F.coalesce(F.col("cnt"), F.lit(0)))
        .groupBy(key_col)
        .agg(F.min("cnt").alias("n_cms"))
    )


def start_cms_stream(
    spark,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    key_col: str,
    d: int = 4,
    w: int = 64,
    schema: str | None = None,
):
    """Maintain a live Count-Min frequency store over a file stream."""
    stream = spark.readStream.schema(
        schema or f"{key_col} long"
    ).parquet(input_dir)
    ingest = make_cms_ingest(spark, store_path, key_col, d=d, w=w)
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
