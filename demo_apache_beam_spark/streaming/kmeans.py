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
    never re-read per batch. The kernel is pinned to ``"literal"``:
    the store being served was bootstrapped by the literal kernel
    (``distributed_kmeans``), and streamed epochs must accumulate the
    same evaluation order (review r10 — ``"auto"`` would silently
    switch kernels at large k and near-tie rows could diverge from a
    batch recompute)."""
    from .idempotent import write_windowed_idempotent

    centroids = load_centroids(spark, centroids_path)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        assigned = kmeans_assign(
            batch_df, centroids, id_col=id_col, vec_col=vec_col,
            kernel="literal",
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


def make_kmeans_drift_ingest(
    spark,
    store_path: str,
    out_path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    jsd_threshold: float = 0.05,
    dist_ratio_threshold: float = 1.5,
):
    """Retrain-trigger monitor for the pinned-centroid assignment stream
    (VERDICT r9 item 7): the store pins centroids forever until a manual
    rebuild, so SOMETHING has to say when the pin has gone stale. This
    foreachBatch callable scores every epoch against the TRAINING run's
    baseline on two drift axes and emits one monitor row per epoch:

    - **cluster-mix drift** — add-one-smoothed Jensen–Shannon divergence
      (the engine's one JSD definition,
      ``operators.selection.jsd_of_histograms``, over cluster-id
      histograms) between the stored training assignment's cluster
      distribution and this epoch's. A new content regime lands its
      vectors in a different cluster mix long before any distance blows
      up.
    - **fit degradation** — epoch mean assign distance over the training
      run's mean (``mean_dist_ratio``): vectors far from EVERY pinned
      centroid (a genuinely new region of embedding space) inflate it
      even when the mix looks stable. Null when the baseline mean is 0
      (degenerate store: every training point was a centroid) — the JSD
      axis still fires.

    ``retrain_recommended`` is true when either axis crosses its
    threshold. The monitor only RECOMMENDS — rebuilding the store is the
    owner's batch operation (a new bootstrap), exactly how the DSIR
    scoring stream documents its model-refresh cadence; assignment keeps
    serving the pinned centroid version in the meantime and every
    assignment row remains reproducible per centroid version.

    Baseline state is loaded ONCE at factory time (k-row cluster
    histogram + one scalar, from the store's own assignment rows); the
    per-epoch cost is the assign projection the stream already pays plus
    a k-row aggregate. Monitor rows land under ``_batch_id`` partitions
    with dynamic partition overwrite — replays rewrite the same
    deterministic row (pinned by pytest).

    Output row: ``(n_points, jsd, mean_dist, mean_dist_ratio,
    retrain_recommended, _batch_id)``.
    """
    from ..operators.selection import jsd_of_histograms
    from ..operators.similarity import kmeans_assign, read_kmeans_store
    from .idempotent import write_windowed_idempotent

    base_assign, centroids = read_kmeans_store(spark, store_path)
    k = len(centroids)

    def cluster_stats(assigned):
        # decimal accumulation + bucket-sorted driver fold: the monitor
        # row must be BIT-identical across replays and restarts, and a
        # plain double sum is partition-order dependent (review r10 —
        # the same discipline jsd_of_histograms applies)
        rows = (
            assigned.groupBy(F.col("cluster").alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("c"),
                F.sum(F.col("dist").cast("decimal(28,12)")).alias("_sd"),
            )
            .collect()  # bounded: <= k rows
        )
        rows.sort(key=lambda r: int(r["bucket"]))
        hist = [(int(r["bucket"]), int(r["c"])) for r in rows]
        n = sum(c for _, c in hist)
        mean = float(sum(r["_sd"] for r in rows) / n)  # Decimal fold
        return hist, n, mean

    base_hist, _base_n, base_mean = cluster_stats(base_assign)

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        epoch_hist, n, mean_dist = cluster_stats(
            kmeans_assign(
                batch_df, centroids, id_col=id_col, vec_col=vec_col,
                kernel="literal",
            )
        )
        jsd = float(
            jsd_of_histograms(
                spark.createDataFrame(base_hist, "bucket long, c long"),
                spark.createDataFrame(epoch_hist, "bucket long, c long"),
                n_buckets=k,
            ).collect()[0]["jsd"]
        )
        ratio = (mean_dist / base_mean) if base_mean > 0 else None
        recommended = jsd > jsd_threshold or (
            ratio is not None and ratio > dist_ratio_threshold
        )
        row = spark.createDataFrame(
            [(n, jsd, mean_dist, ratio, recommended)],
            "n_points long, jsd double, mean_dist double, "
            "mean_dist_ratio double, retrain_recommended boolean",
        )
        write_windowed_idempotent(
            row.withColumn("_batch_id", F.lit(batch_id)),
            out_path,
            partition_col="_batch_id",
        )

    return ingest


def start_kmeans_drift_stream(
    spark,
    input_dir: str,
    store_path: str,
    out_path: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    jsd_threshold: float = 0.05,
    dist_ratio_threshold: float = 1.5,
    schema: str | None = None,
):
    """Monitor a parquet embedding stream for k-means retrain pressure
    against a persisted k-means store (see
    :func:`make_kmeans_drift_ingest`)."""
    stream = spark.readStream.schema(
        schema or f"{id_col} long, {vec_col} array<double>"
    ).parquet(input_dir)
    ingest = make_kmeans_drift_ingest(
        spark, store_path, out_path, id_col=id_col, vec_col=vec_col,
        jsd_threshold=jsd_threshold, dist_ratio_threshold=dist_ratio_threshold,
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
