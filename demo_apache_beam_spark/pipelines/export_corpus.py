"""Training-corpus export CLI — the end-to-end curation pipeline as one
runnable artifact:

    python -m demo_apache_beam_spark.pipelines.export_corpus \\
        --input /root/testdata/sf0.01 --output /tmp/corpus_export

Composes the independently-tested stages in the pipeline order the
curation capstones pin (dedup FIRST — cheapest gate, and near-dup/graph
stages downstream assume replica-free input):

1. exact dedup → canonical copy per content digest
   (``operators/dedup.py:dedup_exact`` — digests only in the shuffle);
2. quality score + language ID gates (``operators/text.py`` — pure
   codegen expressions over one scan);
3. near-dup best-of-cluster (VERDICT r10 item 5): MinHash+LSH pairs →
   connected components → keep the HIGHEST-quality member per cluster
   (the oracle-checked ``dedup_cluster_best`` policy — a
   boilerplate-suffixed copy loses to its clean original on merit, not
   id order). Computed over THIS corpus (the fingerprinted
   ``_neardup_clusters_store`` serves the benchmark fixture's planted
   corpus, a different document set);
4. decontamination (same VERDICT item): the deterministic eval split
   is excluded outright and every training document sharing an 8-token
   shingle with it is dropped through the broadcast Bloom pre-filter +
   exact verify of ``decontaminated_corpus_bloom`` — an exported
   corpus must not train on its own benchmark;
5. sequence packing into fixed context windows
   (``operators/packing.py:pack_by_length`` — histogram solver on the
   driver, 97-98% measured fill);
6. a trainer-consumable layout: rows range-partitioned by ``pack_id``
   (a pack never splits across output files) and sorted by
   (pack_id, doc_id) within each file, so a reader streams whole packs
   file-sequentially.

Prints ONE JSON summary line (input/kept/pack counts, fill ratio) —
the same contract as bench.py. At 100 TB every stage is scan-shaped,
LSH-blocked, or dimension-bounded (see each operator's docstring); the
export write is the only full-corpus shuffle (the range partition by
pack id).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _neardup_best_of_cluster(kept: DataFrame) -> DataFrame:
    """Stage 3: MinHash near-dup clusters over the gated corpus, keeping
    the highest-quality member per cluster (tie: min doc_id) — the
    dedup_cluster_best policy re-applied to the export's own documents.
    Singleton clusters pass through untouched; the argmax window
    partitions are near-dup components (tiny), so the only cost beyond
    the LSH-blocked pair pipeline is one exchange on cluster_id."""
    from pyspark.sql import Window

    from ..operators.dedup import minhash_dedup_pairs
    from ..operators.graph import duplicate_clusters

    pairs = minhash_dedup_pairs(kept.select("doc_id", "text"))
    clusters = duplicate_clusters(
        pairs.select("id_a", "id_b"), kept.select("doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    return (
        kept.join(clusters, "doc_id")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "cluster_id")
    )


def _decontaminate(
    spark: SparkSession, input_dir: str, kept: DataFrame
) -> DataFrame:
    """Stage 4: drop the deterministic eval split and every training
    document sharing an 8-token shingle with it — the Bloom-prefiltered
    exact decontamination of ``decontaminated_corpus_bloom`` (bitset
    broadcast, never the eval strings; exact verify removes the Bloom
    false positives, so the result is bit-identical to a plain
    anti-join). The eval shingles come from the FULL input corpus —
    an eval document dropped by an earlier gate still contaminates."""
    from ..operators.bloom import bloom_build, bloom_prefilter
    from ..sources.tables import load_table

    from ..operators.selection import is_eval_doc

    is_eval = is_eval_doc(F.col("doc_id"))

    def shingles(df):
        toks = df.select("doc_id", F.split("text", " ").alias("toks"))
        return toks.filter(F.size("toks") >= 8).select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(1, size(toks) - 7),"
                        "          p -> concat_ws(' ', slice(toks, p, 8)))"
                    )
                )
            ).alias("shingle"),
        )

    eval_sh = (
        shingles(load_table(spark, input_dir, "documents").filter(is_eval))
        .select("shingle")
        .distinct()
    )
    train = kept.filter(~is_eval)
    train_sh = shingles(train.select("doc_id", "text"))
    bits = bloom_build(eval_sh, "shingle")
    candidates = bloom_prefilter(train_sh, bits, "shingle")
    contaminated = (
        candidates.join(eval_sh, "shingle").select("doc_id").distinct()
    )
    return train.join(contaminated, "doc_id", "left_anti")


def export_corpus(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    context: int = 256,
    min_quality: float = 0.5,
    output_files: int = 8,
) -> dict:
    """Run the export; returns the summary dict (also what main prints)."""
    from ..operators.dedup import dedup_exact
    from ..operators.packing import pack_by_length
    from ..operators.text import with_language_id, with_quality, with_token_count
    from ..sources.tables import load_table

    docs = load_table(spark, input_dir, "documents")
    n_input = docs.count()
    canonical = dedup_exact(docs)
    scored = with_language_id(with_quality(with_token_count(canonical)))
    kept = scored.filter(
        (F.col("quality_score") >= F.lit(float(min_quality)))
        & (F.col("lang_pred") != "unknown")
    ).select(
        "doc_id",
        "text",
        "lang_pred",
        "quality_score",
        F.greatest(F.lit(1), F.least(F.col("n_tokens"), F.lit(context)))
        .cast("long")
        .alias("len_eff"),
    )
    kept = _decontaminate(
        spark, input_dir, _neardup_best_of_cluster(kept)
    )
    packed = pack_by_length(kept, "len_eff", "doc_id", capacity=context)
    out = packed.select(
        "pack_id", "doc_id", "len_eff", "lang_pred", "quality_score", "text"
    )
    (
        out.repartitionByRange(int(output_files), "pack_id")
        .sortWithinPartitions("pack_id", "doc_id")
        .write.mode("overwrite")
        .parquet(output_dir)
    )
    # ONE scan over the export serves every summary number (review r10:
    # a separate count() was a full redundant pass), and an everything-
    # filtered export still honors the one-JSON-line contract (review
    # r10: NULL max/tokens crashed the int() casts).
    stats = (
        spark.read.parquet(output_dir)
        .groupBy("pack_id")
        .agg(F.sum("len_eff").alias("_fill"), F.count(F.lit(1)).alias("_n"))
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("_n").alias("n_docs"),
            F.sum("_fill").alias("tokens"),
            F.max("_fill").alias("max_fill"),
        )
        .collect()[0]
    )
    n_packs = int(stats["n_packs"])
    return {
        "n_input_docs": int(n_input),
        "n_exported_docs": int(stats["n_docs"] or 0),
        "n_packs": n_packs,
        "context": int(context),
        "max_pack_fill": int(stats["max_fill"] or 0),
        "fill_ratio": round(
            float(stats["tokens"]) / (n_packs * context), 4
        )
        if n_packs
        else 0.0,
        "output": output_dir,
    }


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--input", required=True, help="testdata sf dir")
    parser.add_argument("--output", required=True, help="export directory")
    parser.add_argument("--context", type=int, default=256)
    parser.add_argument("--min-quality", type=float, default=0.5)
    parser.add_argument("--output-files", type=int, default=8)
    args = parser.parse_args(argv)

    from ..session import get_spark

    spark = get_spark("export-corpus")
    summary = export_corpus(
        spark,
        args.input,
        args.output,
        context=args.context,
        min_quality=args.min_quality,
        output_files=args.output_files,
    )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
