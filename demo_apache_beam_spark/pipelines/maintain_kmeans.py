"""k-means store maintenance CLI — the schedulable monitor→retrain loop
(r12, VERDICT r11 item 4):

    python -m demo_apache_beam_spark.pipelines.maintain_kmeans \\
        --store /path/to/kmeans_store \\
        --monitor /path/to/drift_monitor_out \\
        --corpus /root/testdata/sf0.01 [--k 8] [--iters 2]

Reads the drift monitor's latest epoch row
(``streaming/kmeans.py:make_kmeans_drift_ingest`` output), applies the
documented threshold decision it already carries (``retrain_recommended``),
and invokes ``operators/similarity.py:retrain_kmeans_store`` over the
current corpus when — and only when — it recommends and hasn't been acted
on (``operators/similarity.py:check_and_retrain_kmeans`` owns the
idempotence contract: no-recommendation and already-acted runs are
no-ops, epoch unchanged, store bytes untouched). Prints ONE JSON line —
the bench.py/export_corpus contract — so a cron wrapper can log/alert on
``retrained``/``epoch``.

``--corpus`` is either a testdata sf directory (the ``embeddings`` table
is loaded through the NTZ-safe reader) or a direct parquet path carrying
``(--id-col, --vec-col)``.
"""

from __future__ import annotations

import argparse
import json
import os


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--store", required=True, help="k-means store path")
    parser.add_argument("--monitor", required=True,
                        help="drift monitor output path")
    parser.add_argument("--corpus", required=True,
                        help="sf dir (embeddings table) or parquet path")
    parser.add_argument("--k", type=int, default=8)
    parser.add_argument("--iters", type=int, default=2)
    parser.add_argument("--id-col", default="vec_id")
    parser.add_argument("--vec-col", default="embedding")
    args = parser.parse_args(argv)

    from ..operators.similarity import check_and_retrain_kmeans
    from ..session import get_spark

    spark = get_spark("maintain-kmeans")
    if os.path.exists(os.path.join(args.corpus, "embeddings.parquet")):
        from ..sources.tables import load_table

        emb = load_table(spark, args.corpus, "embeddings").select(
            args.id_col, args.vec_col
        )
    else:
        emb = spark.read.parquet(args.corpus).select(
            args.id_col, args.vec_col
        )
    result = check_and_retrain_kmeans(
        spark,
        args.store,
        args.monitor,
        emb,
        k=args.k,
        iters=args.iters,
        id_col=args.id_col,
        vec_col=args.vec_col,
    )
    print(json.dumps(result))


if __name__ == "__main__":
    main()
