"""Regenerate PLANS.md — formatted physical plans for the headline queries:

    python -m demo_apache_beam_spark.tools.gen_plans_md [out_path]

The point is auditability of the scale claims: every docstring in
queries.py asserts plan properties (pushdown, broadcast choice, exchange
count, codegen); this artifact pins what Catalyst actually produces at the
test SF so a reviewer can check the claim against the plan without running
anything. Plan-shape regressions are separately gated by
tests/test_plans.py — this file is the human-readable companion.
"""

from __future__ import annotations

import re
import sys

# one representative per plan family — scan/agg, fact-fact join, dim
# broadcasts, window, set-op, HOF map, shingle join, topk, ANN, layout
HEADLINE = [
    "user_score",
    "pricing_summary",
    "priority_by_line_status",
    "revenue_by_nation",
    "top_customers",
    "team_rank_per_window",
    "doc_repetition_quality",
    "corpus_decontamination",
    "corpus_vocab_topk",
    "dedup_exact",
    "embedding_knn",
    "events_zorder_index",
    "inverted_index",
    "edit_distance_pairs",
    "key_skew_profile",
    "m4_downsample",
    "user_snapshot_diff",
    "doc_quality_gate",
    "doc_unigram_logprob",
    # round-6 additions: ANN bucket self-join graph, window-coverage span dedup
    "knn_graph_lsh",
    "dedup_spans",
    # round-7 additions: oracle-backed series similarity, segmented-scan
    # EWMA, broadcast-side semantic decontamination
    "user_series_topk",
    "user_value_ewma",
    "embedding_decontamination",
    # single-text-scan domain-mix audit
    "corpus_source_mix",
    # oracle-checkable portable-hash near-dup (md5 chains; candidate
    # generation itself value-checked against DuckDB)
    "dedup_minhash_portable",
    # broadcast-model data selection and k-row-sketch set ops
    "doc_dsir_selection",
    "team_overlap_kmv",
    # round-8 additions (VERDICT r7 #5): the erasure dry-run's broadcast
    # semi-probes and one budget-family keyed prefix-scan plan
    "user_erasure_audit",
    "corpus_budget_fill",
    # round-9/10 additions (VERDICT r9 #1): the store-served k-means
    # assignment (map-only read), the fixed-centroid delta assign, and
    # the two perceptual near-dup probe joins (image dHash store-served,
    # audio chromaprint-shaped inline)
    "embedding_kmeans",
    "embedding_kmeans_delta_assign",
    "media_image_near_dup",
    "media_audio_near_dup",
    # r10 late additions: the fourth perceptual modality and the
    # scan-only PII scrub (zero-shuffle compliance pass)
    "media_video_near_dup",
    "doc_pii_scrub",
    # r10 second-wave families: blocked entity resolution (equi-join on
    # the blocking key, residual-only inequality), histogram sequence
    # packing (keyed prefix ranks + broadcast range join), and the
    # quantized-vs-exact retrieval eval (integer-dot candidate side)
    "customer_record_linkage",
    "doc_context_packing",
    "retrieval_eval_quantized",
]

_SCRUB = re.compile(
    r"#\d+L?|file:[^\],\s]+|, \[plan_id=\d+\]"
    # session-counter noise: lambda variable suffixes (x_15 → x), RDD ids
    r"|(?<=lambda [a-z])_\d+|(?<=MapPartitionsRDD)\[\d+\]"
)


def _clean(plan: str) -> str:
    # strip expression/plan ids, lambda counters + absolute paths so
    # regenerating is diff-stable; render literal control characters in
    # expressions (content_key's 0x1f separator / 0x00 sentinel) as
    # escapes so the artifact stays plain text
    plan = _SCRUB.sub("", plan)
    return "".join(
        c if c in "\n\t" or ord(c) >= 0x20 else f"\\x{ord(c):02x}" for c in plan
    )


def generate(out_path: str = "PLANS.md", sf_dir: str = "/root/testdata/sf0.001") -> None:
    from ..queries import REGISTRY
    from ..session import get_spark

    spark = get_spark("gen-plans", cpus="8")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # show final physical plan
    lines = [
        "# Physical plans — headline queries",
        "",
        "Auto-generated (`python -m demo_apache_beam_spark.tools.gen_plans_md`) "
        f"at {sf_dir}, AQE off for a fully resolved static plan; expression IDs "
        "and paths scrubbed. Scale-critical properties (pushdown, broadcast "
        "choice, exchange counts, codegen spans) are enforced by "
        "`tests/test_plans.py`; this file is the readable audit trail for "
        "the claims made in each query's docstring (QUERIES.md).",
    ]
    for name in HEADLINE:
        df = REGISTRY[name].fn(spark, sf_dir)
        mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
        plan = df._jdf.queryExecution().explainString(mode)
        lines += ["", f"## {name}", "", "```", _clean(plan).rstrip(), "```"]
    spark.stop()
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(HEADLINE)} plans")


if __name__ == "__main__":
    generate(*sys.argv[1:])
