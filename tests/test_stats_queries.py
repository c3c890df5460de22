"""Math-reference checks for the statistics queries.

The registry oracle proves DuckDB/Spark PARITY; these prove the MATH —
an independent pure-Python/numpy implementation of the same definition
must reproduce the query's numbers on the fixture data (both engines
encoding the same wrong formula would slip through parity alone)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from conftest import SF_SMALL
from demo_apache_beam_spark.queries import REGISTRY
from demo_apache_beam_spark.sources.tables import load_table


def test_token_entropy_matches_python_reference(spark):
    import re

    docs = {r["doc_id"]: r["text"] for r in load_table(spark, SF_SMALL, "documents").collect()}
    got = {
        r["doc_id"]: r
        for r in REGISTRY["doc_token_entropy"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(docs)
    for doc_id, text in docs.items():
        counts = Counter(re.findall(r"[a-z0-9]+", text.lower()))
        n = sum(counts.values())
        h_bits = (math.log(n) - sum(c * math.log(c) for c in counts.values()) / n) / math.log(2)
        row = got[doc_id]
        assert row["n_tokens"] == n
        assert row["n_types"] == len(counts)
        assert abs(row["ttr"] - len(counts) / n) < 1e-6
        assert abs(row["entropy_bits"] - h_bits) < 1e-6
        # sanity bounds: 0 <= H <= log2(types) (1e-6 slack: output is
        # rounded to 6 dp, so a uniform doc can sit 5e-7 above the bound)
        assert -1e-6 <= row["entropy_bits"] <= math.log2(max(len(counts), 2)) + 1e-6


def test_welch_t_matches_numpy_reference(spark):
    import numpy as np

    ev = load_table(spark, SF_SMALL, "events").select(
        "event_type", "user_id", "value"
    ).collect()
    by_type: dict = {}
    for r in ev:
        va = int(hashlib.md5(f"ab1:{r['user_id']}".encode()).hexdigest()[:6], 16) % 2 == 0
        by_type.setdefault(r["event_type"], ([], []))[0 if va else 1].append(r["value"])
    got = {r["event_type"]: r for r in REGISTRY["events_ab_test"].fn(spark, SF_SMALL).collect()}
    assert set(got) == set(by_type)
    for et, (a, b) in by_type.items():
        a, b = np.array(a), np.array(b)
        row = got[et]
        assert row["n_a"] == len(a) and row["n_b"] == len(b)
        va, vb = a.var(ddof=1), b.var(ddof=1)
        se2 = va / len(a) + vb / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(se2)
        df = se2**2 / (
            (va / len(a)) ** 2 / (len(a) - 1) + (vb / len(b)) ** 2 / (len(b) - 1)
        )
        assert abs(row["mean_a"] - a.mean()) < 1e-6
        assert abs(row["mean_b"] - b.mean()) < 1e-6
        assert abs(row["welch_t"] - t) < 1e-6
        assert abs(row["welch_df"] - df) < 1e-6
        # Welch df sits between min(na,nb)-1 and na+nb-2
        assert min(len(a), len(b)) - 1 - 1e-9 <= df <= len(a) + len(b) - 2 + 1e-9


def test_quantile_rollup_bounds_true_quantiles(spark):
    """The histogram upper bound must bracket the true order-statistic
    quantile: v_q <= p_ub < v_q + bin_width (exact by construction for
    unclamped bins)."""
    import numpy as np

    vals: dict = {}
    for r in load_table(spark, SF_SMALL, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    got = {
        r["event_type"]: r
        for r in REGISTRY["value_quantile_rollup"].fn(spark, SF_SMALL).collect()
    }
    assert set(got) == set(vals)
    for et, v in vals.items():
        v = np.sort(np.array(v))
        row = got[et]
        assert row["n_events"] == len(v)
        for q, col in ((0.5, "p50_ub"), (0.9, "p90_ub"), (0.99, "p99_ub")):
            # smallest value whose cumulative count reaches q*n — the
            # same "cum >= q*n" definition the histogram uses
            vq = v[int(math.ceil(q * len(v))) - 1]
            ub = row[col]
            assert vq <= ub, f"{et} {col}: true {vq} > bound {ub}"
            if ub < 640:  # unclamped bin: bound is tight to one bin width
                assert ub - 10 <= vq, f"{et} {col}: bound {ub} loose vs {vq}"
