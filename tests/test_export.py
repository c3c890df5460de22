"""End-to-end training-corpus export CLI: stage composition, the
trainer-consumable layout (packs never split across files), and the
summary contract."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMALL


def test_export_corpus_end_to_end(spark, tmp_path):
    from demo_apache_beam_spark.operators.dedup import dedup_exact
    from demo_apache_beam_spark.operators.text import (
        with_language_id,
        with_quality,
        with_token_count,
    )
    from demo_apache_beam_spark.pipelines.export_corpus import export_corpus
    from demo_apache_beam_spark.sources.tables import load_table

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

    # exported doc set == the independently-composed gates
    docs = load_table(spark, SF_SMALL, "documents")
    expect_scored = with_language_id(
        with_quality(with_token_count(dedup_exact(docs)))
    ).filter(
        (F.col("quality_score") >= 0.5) & (F.col("lang_pred") != "unknown")
    )
    expect_ids = {r["doc_id"] for r in expect_scored.select("doc_id").collect()}
    assert {r["doc_id"] for r in rows} == expect_ids

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
