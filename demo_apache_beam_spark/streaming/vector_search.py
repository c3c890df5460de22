"""Streaming vector search — a query-embedding stream answered against a
persisted IVF index (engine extension; the reference has no vector
surface, SURVEY.md §2.9).

The serving half of the ANN lifecycle in ``operators/similarity.py``:
``ivf_build`` + ``ivf_save`` run once over the corpus offline; this
module consumes an unbounded stream of (query_id, embedding) rows and
answers each micro-batch with ``ivf_topk`` against the loaded index —
the coarse quantizer is nlist driver rows loaded once at stream start,
and every batch's probe scans only its nprobe cell partitions of the
inverted file.

Exactly-once: results are keyed by the micro-batch epoch and written
with dynamic partition overwrite (``_batch_id`` directories), so a
replayed epoch rewrites its own partition instead of appending
duplicates — the same idempotence contract as the windowed table sink
(``idempotent.py``).

At scale the per-batch work is the bounded-query-side regime of the
blocked kernels: a micro-batch of Q queries broadcasts Q·d doubles and
streams the probed cells once; corpus size only enters through cell
fan-in, which nlist ∝ N keeps constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def start_streaming_knn(
    spark: SparkSession,
    query_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    corpus: DataFrame,
    index_path: str,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> StreamingQuery:
    """Answer a file-stream of query embeddings from a saved IVF index.

    ``query_dir`` holds parquet files of (query_id long, embedding
    array<float>) rows — the unbounded side. Results land under
    ``out_dir`` partitioned by ``_batch_id`` with columns
    (query_id, neighbor_id, cosine, rank).
    """
    from ..operators.similarity import ivf_load, ivf_topk
    from .idempotent import write_windowed_idempotent

    index = ivf_load(spark, index_path)

    stream = spark.readStream.schema(
        f"query_id long, {vec_col} array<float>"
    ).parquet(query_dir)

    def answer(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        hits = ivf_topk(
            corpus,
            batch_df,
            k=k,
            nprobe=nprobe,
            id_col=id_col,
            vec_col=vec_col,
            index=index,
            # external query ids share no namespace with corpus ids — an
            # id collision must not drop a real neighbor
            exclude_self=False,
        ).withColumn("_batch_id", F.lit(batch_id))
        write_windowed_idempotent(hits, out_dir, partition_col="_batch_id")

    return (
        stream.writeStream.foreachBatch(answer)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
