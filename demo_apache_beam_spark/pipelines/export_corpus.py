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
3. sequence packing into fixed context windows
   (``operators/packing.py:pack_by_length`` — histogram solver on the
   driver, 97-98% measured fill);
4. a trainer-consumable layout: rows range-partitioned by ``pack_id``
   (a pack never splits across output files) and sorted by
   (pack_id, doc_id) within each file, so a reader streams whole packs
   file-sequentially.

Prints ONE JSON summary line (input/kept/pack counts, fill ratio) —
the same contract as bench.py. At 100 TB every stage is scan-shaped or
dimension-bounded (see each operator's docstring); the export write is
the only full-corpus shuffle (the range partition by pack id).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
