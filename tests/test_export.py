"""End-to-end training-corpus export CLI: stage composition (exact
dedup → gates → near-dup best-of-cluster → decontamination → packing),
the trainer-consumable layout (packs never split across files), and the
summary contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from conftest import SF_SMALL


def _expected_export_ids(spark, input_dir, min_quality=0.5, context=256):
    """The export's kept set composed INDEPENDENTLY of the pipeline
    module: exact dedup + gates via the operators, near-dup
    best-of-cluster via a collected argmax over the verified pair list,
    decontamination via the PLAIN exact shingle anti-join (no Bloom —
    the prefilter must not change the result)."""
    from demo_apache_beam_spark.operators.dedup import (
        dedup_exact,
        minhash_dedup_pairs,
    )
    from demo_apache_beam_spark.operators.graph import duplicate_clusters
    from demo_apache_beam_spark.operators.text import (
        with_language_id,
        with_quality,
        with_token_count,
    )
    from demo_apache_beam_spark.sources.tables import load_table

    docs = load_table(spark, input_dir, "documents")
    scored = with_language_id(
        with_quality(with_token_count(dedup_exact(docs)))
    ).filter(
        (F.col("quality_score") >= min_quality) & (F.col("lang_pred") != "unknown")
    )
    # near-dup best-of-cluster: collected argmax (highest quality, then
    # min id) over duplicate_clusters of the verified MinHash pairs
    quality = {
        r["doc_id"]: r["quality_score"]
        for r in scored.select("doc_id", "quality_score").collect()
    }
    pairs = minhash_dedup_pairs(scored.select("doc_id", "text"))
    clusters = duplicate_clusters(
        pairs.select("id_a", "id_b"), scored.select("doc_id")
    )
    by_cluster: dict = {}
    for r in clusters.collect():
        by_cluster.setdefault(r["cluster_id"], []).append(r["doc_id"])
    best = {
        min(members, key=lambda d: (-quality[d], d))
        for members in by_cluster.values()
    }

    # decontamination: plain exact anti-join on 8-token shingles
    from demo_apache_beam_spark.operators.selection import is_eval_doc

    is_eval = is_eval_doc(F.col("doc_id"))

    def shingle_df(df):
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

    eval_shingles = {
        r["shingle"]
        for r in shingle_df(docs.filter(is_eval)).select("shingle").distinct().collect()
    }
    eval_ids = {r["doc_id"] for r in docs.filter(is_eval).select("doc_id").collect()}
    surv = scored.filter(scored.doc_id.isin(list(best))) if best else scored
    contaminated = {
        r["doc_id"]
        for r in shingle_df(surv.select("doc_id", "text")).collect()
        if r["shingle"] in eval_shingles
    }
    return {d for d in best if d not in eval_ids and d not in contaminated}


def test_export_corpus_end_to_end(spark, tmp_path):
    from demo_apache_beam_spark.pipelines.export_corpus import export_corpus

    out = str(tmp_path / "export")
    summary = export_corpus(spark, SF_SMALL, out, context=256, output_files=4)

    # summary contract
    assert summary["n_packs"] >= 1
    assert summary["max_pack_fill"] <= 256
    assert 0.9 <= summary["fill_ratio"] <= 1.0
    assert summary["n_exported_docs"] <= summary["n_input_docs"]

    df = spark.read.parquet(out)
    rows = df.collect()
    assert len(rows) == summary["n_exported_docs"]

    # exported doc set == the independently-composed five stages
    assert {r["doc_id"] for r in rows} == _expected_export_ids(spark, SF_SMALL)

    # pack invariants: capacity respected, ids contiguous
    load = {}
    for r in rows:
        load[r["pack_id"]] = load.get(r["pack_id"], 0) + r["len_eff"]
    assert max(load.values()) <= 256
    assert set(load) == set(range(len(load)))

    # trainer layout: a pack never splits across output files
    per_pack_files = (
        df.select("pack_id", F.input_file_name().alias("f"))
        .groupBy("pack_id")
        .agg(F.count_distinct("f").alias("nf"))
        .agg(F.max("nf").alias("m"))
        .collect()[0]["m"]
    )
    assert per_pack_files == 1


def _non_eval_id(start):
    """Smallest doc_id >= start outside the deterministic eval split."""
    from demo_apache_beam_spark.operators.selection import (
        EVAL_HOLDOUT_PERMILLE,
    )

    i = start
    while ((i % 1000) * 2654435761) % 1000 < EVAL_HOLDOUT_PERMILLE:
        i += 1
    return i


def test_export_corpus_planted_neardup_and_contamination(spark, tmp_path):
    """The two r10 gaps, planted (VERDICT r10 item 5): a lower-quality
    near-dup twin of an exported document must NOT be exported while
    its original survives (best-of-cluster on merit), and a
    gate-passing document that copies an 8-token span from an
    eval-split document must be excluded by decontamination."""
    from demo_apache_beam_spark.operators.text import (
        with_language_id,
        with_quality,
        with_token_count,
    )
    from demo_apache_beam_spark.pipelines.export_corpus import export_corpus
    from demo_apache_beam_spark.sources.tables import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    from demo_apache_beam_spark.operators.selection import is_eval_doc

    is_eval = is_eval_doc(F.col("doc_id"))
    # an EVAL-split document with >= 8 tokens to steal a span from
    eval_doc = (
        docs.filter(is_eval)
        .filter(F.size(F.split("text", " ")) >= 8)
        .orderBy("doc_id")
        .first()
    )
    assert eval_doc is not None
    span = " ".join(eval_doc["text"].split(" ")[:8])

    # all three plants are synthesized from the corpus vocabulary (the
    # fixture's texts are word soup over the same words), with enough
    # 'the'/'a' stopwords to pass the quality/language gates; the
    # distinctive orderings keep them from near-dupping real documents
    max_id = int(docs.agg(F.max("doc_id")).collect()[0][0])
    orig_id = _non_eval_id(max_id + 1)
    twin_id = _non_eval_id(orig_id + 1)
    contam_id = _non_eval_id(twin_id + 1)
    orig_text = (
        "the spark window join a filter merge the stream sort data a "
        "batch scan the group table a key row the customer value hash "
        "agg the part order a line column the query small big the fast "
        "slow dup a stream merge the window batch sort a join filter"
    )
    twin_text = orig_text + " and the batch window stream merge"
    filler_a = (
        "the agg hash value a customer row key the table group scan a "
        "batch data sort the merge stream filter a join window spark"
    )
    filler_b = (
        "the column line order a part agg hash the value customer row "
        "a key table group the scan data sort a merge stream filter"
    )
    contam_text = f"{filler_a} {span} {filler_b}"

    planted = spark.createDataFrame(
        [(orig_id, orig_text), (twin_id, twin_text), (contam_id, contam_text)],
        "doc_id long, text string",
    )
    base_cols = docs.columns
    for c in [c for c in base_cols if c not in ("doc_id", "text")]:
        planted = planted.withColumn(c, F.lit(None).cast(dict(docs.dtypes)[c]))
    input_dir = str(tmp_path / "sf_planted")
    docs.unionByName(planted.select(*base_cols)).write.parquet(
        f"{input_dir}/documents.parquet"
    )

    # fixture sanity: every plant passes the gates on its own merits
    pdocs = load_table(spark, input_dir, "documents")
    pscored = with_language_id(with_quality(with_token_count(pdocs)))
    plant_rows = {
        r["doc_id"]: r
        for r in pscored.filter(
            F.col("doc_id").isin([orig_id, twin_id, contam_id])
        ).collect()
    }
    for pid in (orig_id, twin_id, contam_id):
        assert plant_rows[pid]["quality_score"] >= 0.5, pid
        assert plant_rows[pid]["lang_pred"] != "unknown", pid

    out = str(tmp_path / "export_planted")
    export_corpus(spark, input_dir, out, context=256, output_files=2)
    exported = {
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    }

    # near-dup pair: exactly the higher-quality member survives
    # (tie → min id); the twin appended tokens, so its quality differs
    # from the original's — whichever is lower must be gone
    q_orig = plant_rows[orig_id]["quality_score"]
    q_twin = plant_rows[twin_id]["quality_score"]
    winner, loser = (
        (twin_id, orig_id)
        if (q_twin, -twin_id) > (q_orig, -orig_id)
        else (orig_id, twin_id)
    )
    assert winner in exported
    assert loser not in exported

    # contamination: the planted copier is excluded even though it
    # passed every gate
    assert contam_id not in exported


def test_export_corpus_cli_smoke(tmp_path, capsys):
    """main() parses args, runs, and prints ONE JSON summary line."""
    from demo_apache_beam_spark.pipelines.export_corpus import main

    out = str(tmp_path / "cli_export")
    main(["--input", SF_SMALL, "--output", out, "--output-files", "2"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(line)
    assert summary["output"] == out
    assert summary["n_packs"] >= 1
    assert summary["fill_ratio"] >= 0.9