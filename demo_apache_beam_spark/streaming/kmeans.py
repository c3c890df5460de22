"""Streaming k-means assignment — cluster a document/embedding stream
against a pinned centroid store.

The serving half of ``operators/similarity.py:distributed_kmeans``, the
exact shape of the DSIR scoring stream (``streaming/selection.py``): the
centroid list is loaded ONCE from the store a training run persisted
(``incremental_kmeans_assign``'s ``{store}/centroids``), frozen for the
life of the query, and every micro-batch of incoming vectors is assigned
by the map-only literal-centroid projection (``kmeans_assign`` — no
shuffle, no broadcast, no history re-read). Assigned epochs land under
``_batch_id`` partitions with dynamic partition overwrite (the engine's
replay-idempotence pattern), so at-least-once redelivery rewrites the
same partition with the same deterministic rows.

Because assignment is a pure per-row function of (embedding, centroids),
the union of streamed epoch assignments equals the batch
``kmeans_assign`` over everything streamed BIT-FOR-BIT — insensitive to
batching (pinned by pytest alongside the replay no-op). Re-train cadence
at 100 TB: rebuild the centroid store on whatever schedule drift
demands; assignment keeps serving the pinned centroid version in the
meantime (assignments are reproducible per centroid version by
construction), exactly how the DSIR stream pins its model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.similarity import kmeans_assign


def load_centroids(spark, centroids_path: str) -> list[list[float]]:
    """The pinned centroid list from a ``{store}/centroids`` parquet
    (``cluster long, centroid array<double>``) — bounded k-row collect."""
    rows = spark.read.parquet(centroids_path).orderBy("cluster").collect()
    if not rows:
        raise ValueError(f"no centroids at {centroids_path}")
    return [[float(x) for x in r["centroid"]] for r in rows]


def make_kmeans_assign_ingest(
    spark,
    centroids_path: str,
    out_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """The foreachBatch callable: assign the batch against the pinned
    centroids and write under this epoch's partition (replay-safe
    overwrite). Centroids load once at factory time — the store is
    never re-read per batch."""
    from .idempotent import write_windowed_idempotent

    centroids = load_centroids(spark, centroids_path)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assigned = kmeans_assign(
            batch_df, centroids, id_col=id_col, vec_col=vec_col
        )
        write_windowed_idempotent(
            assigned.withColumn("_batch_id", F.lit(batch_id)),
            out_path,
            partition_col="_batch_id",
        )

    return ingest


def start_kmeans_assign_stream(
    spark,
    input_dir: str,
    centroids_path: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    schema: str | None = None,
):
    """Assign a parquet embedding stream against a persisted centroid
    store."""
    stream = spark.readStream.schema(
        schema or f"{id_col} long, {vec_col} array<double>"
    ).parquet(input_dir)
    ingest = make_kmeans_assign_ingest(
        spark, centroids_path, out_path, id_col=id_col, vec_col=vec_col
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
