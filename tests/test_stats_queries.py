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


def test_waterfill_closed_form_matches_iterative_reference(spark):
    """The closed-form water level (first capped candidate in ascending
    order) must equal the iterative reference max{c : sum(min(t_i, c))
    <= B} on random totals, including the all-fit and all-capped
    regimes."""
    import random

    from pyspark.sql import functions as F

    rng = random.Random(4242)
    for trial in range(6):
        n = rng.randint(1, 12)
        totals = [rng.randint(1, 1000) for _ in range(n)]
        B = rng.choice(
            [sum(totals) + 10, sum(totals) // 2 + 1, min(totals), 1]
        )

        # iterative reference: sort ascending, admit while fair share
        # covers the next total, else cap
        def reference(ts, budget):
            ts = sorted(ts)
            rem, out = float(budget), {}
            for i, t in enumerate(ts):
                share = rem / (len(ts) - i)
                take = min(float(t), share)
                out[i] = take
                rem -= take
            return sorted(out.values())

        # the PRODUCTION kernel — the same helper corpus_budget_waterfill
        # calls, so a drift in the real formula fails this test
        from demo_apache_beam_spark.operators.packing import (
            waterfill_allocations,
        )

        rows = [(f"s{i}", t) for i, t in enumerate(totals)]
        df = spark.createDataFrame(rows, "source string, total_chars long")
        got = sorted(
            r["alloc"]
            for r in waterfill_allocations(
                df, float(B), "source", "total_chars"
            ).collect()
        )
        want = reference(totals, B)
        # helper rounds each alloc to 6dp -> per-value 5e-7, summed 6e-6
        assert all(abs(g - w_) < 1e-5 for g, w_ in zip(got, want)), (
            trial, totals, B, got, want,
        )
        assert abs(sum(got) - min(float(B), float(sum(totals)))) < 1e-4


def test_fingerprint_is_order_and_partitioning_invariant(spark):
    """The table fingerprint must not move under row shuffling or
    repartitioning, and must move when any value changes."""
    from demo_apache_beam_spark.queries import REGISTRY

    from conftest import SF_SMALL

    fn = REGISTRY["lineitem_fingerprint"].fn
    a = fn(spark, SF_SMALL).collect()[0]
    b = fn(spark, SF_SMALL).collect()[0]  # replan/re-read
    assert (a["n_rows"], a["checksum"]) == (b["n_rows"], b["checksum"])

    # permutation + repartition invariance on a synthetic copy of the
    # same arithmetic
    from pyspark.sql import functions as F

    rows = [(i, i % 7, float(i % 50), chr(65 + i % 3)) for i in range(500)]
    df = spark.createDataFrame(
        rows, "l_orderkey long, l_linenumber long, l_quantity double, "
        "l_returnflag string"
    )

    def checksum(d):
        hx = F.md5(
            F.concat_ws(
                ":",
                F.lit("fp"),
                F.coalesce(F.col("l_orderkey").cast("string"), F.lit("\x01")),
                F.coalesce(F.col("l_linenumber").cast("string"), F.lit("\x01")),
                F.coalesce(F.col("l_quantity").cast("string"), F.lit("\x01")),
                F.coalesce(F.col("l_returnflag"), F.lit("\x01")),
            )
        )
        rh = F.conv(F.substring(hx, 1, 12), 16, 10).cast("long")
        return d.select(rh.alias("rh")).agg(
            F.pmod(
                F.sum(F.col("rh").cast("decimal(20,0)")),
                F.lit(281474976710656),
            ).cast("long")
        ).collect()[0][0]

    base = checksum(df)
    assert checksum(df.orderBy(F.rand(7))) == base
    assert checksum(df.repartition(13)) == base
    changed = df.withColumn(
        "l_quantity",
        F.when(F.col("l_orderkey") == 123, F.lit(999.0)).otherwise(
            F.col("l_quantity")
        ),
    )
    assert checksum(changed) != base


def test_negative_samples_invariants(spark):
    """Every negative has a different label, no anchor exceeds k, the
    draw is deterministic across runs, and anchors with enough
    eligible candidates in their bucket get exactly k."""
    from demo_apache_beam_spark.operators.selection import negative_samples

    rows = [(i, i % 4) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, label int")
    out1 = sorted(
        tuple(r) for r in negative_samples(df, "vec_id", "label", k=3).collect()
    )
    out2 = sorted(
        tuple(r) for r in negative_samples(df, "vec_id", "label", k=3).collect()
    )
    assert out1 == out2 and out1
    per_anchor: dict = {}
    for anchor_id, anchor_label, neg_id, neg_label, rn in out1:
        assert neg_label != anchor_label
        assert neg_id != anchor_id
        assert 1 <= rn <= 3
        per_anchor[anchor_id] = per_anchor.get(anchor_id, 0) + 1
    assert max(per_anchor.values()) == 3
    # with 400 vecs in 8 buckets and 4 labels, every bucket holds ~50
    # candidates (~37 eligible) -> every anchor should reach k
    assert min(per_anchor.values()) == 3
    assert len(per_anchor) == 400


def test_user_event_patterns_reference(spark):
    """CEP-lite metrics vs a pure-Python regex reference built from the
    raw fixture events — pins the (ts, event_id) sequence order, the
    non-overlapping greedy funnel count, adjacency flag, and run length."""
    import re

    ev = load_table(spark, SF_SMALL, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    raw = ev.collect()
    seqs: dict = {}
    for r in sorted(raw, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        seqs.setdefault(r["user_id"], []).append(r["event_type"][0])
    expect = {}
    for uid, codes in seqs.items():
        s = "".join(codes)
        runs = re.findall(r"c+", s)
        expect[uid] = (
            len(s),
            len(re.findall(r"v[^p]*p", s)),
            re.search("pe", s) is not None,
            max((len(x) for x in runs), default=0),
        )
    out = REGISTRY["user_event_patterns"].fn(spark, SF_SMALL)
    got = {
        r["user_id"]: (
            r["n_events"],
            r["n_funnels"],
            r["error_after_purchase"],
            r["longest_click_run"],
        )
        for r in out.collect()
    }
    assert got == expect


def test_target_encode_oof_reference(spark):
    """OOF target encoding vs a pure-Python complement-mean reference:
    no row's own target leaks into its feature, and a category confined
    to a single fold encodes as NULL."""
    import pytest

    from demo_apache_beam_spark.operators.encoding import target_encode_oof

    rows = [
        # (id, cat, target, fold)
        (1, "a", 10.0, 0), (2, "a", 20.0, 0),
        (3, "a", 30.0, 1), (4, "a", 40.0, 2),
        (5, "b", 5.0, 0), (6, "b", 7.0, 1),
        (7, "c", 99.0, 1),            # only fold -> NULL
    ]
    df = spark.createDataFrame(
        rows, "rid long, cat string, target double, fold int"
    )
    out = {
        r["rid"]: r["te_value"]
        for r in target_encode_oof(df, "cat", "target", "fold").collect()
    }
    by_cat: dict = {}
    for rid, cat, t, f in rows:
        by_cat.setdefault(cat, []).append((t, f))
    for rid, cat, t, f in rows:
        others = [tv for tv, fv in by_cat[cat] if fv != f]
        if not others:
            assert out[rid] is None, rid
        else:
            assert out[rid] == pytest.approx(
                sum(others) / len(others), rel=1e-12
            ), rid
    # leak check by construction: row 3's encoding excludes its own 30.0
    assert out[3] == pytest.approx((10.0 + 20.0 + 40.0) / 3)


def test_target_encode_oof_keeps_null_keys(spark):
    """NULL categories/folds are legitimate groups: their rows must
    survive the encode join (null-safe left join), with the complement
    mean computed over the other NULL-key rows."""
    import pytest

    from demo_apache_beam_spark.operators.encoding import target_encode_oof

    rows = [
        (1, None, 10.0, 0), (2, None, 20.0, 1), (3, None, 60.0, 1),
        (4, "a", 5.0, 0), (5, "a", 7.0, 1),
    ]
    df = spark.createDataFrame(
        rows, "rid long, cat string, target double, fold int"
    )
    out = {
        r["rid"]: r["te_value"]
        for r in target_encode_oof(df, "cat", "target", "fold").collect()
    }
    assert set(out) == {1, 2, 3, 4, 5}, "no input row may be dropped"
    assert out[1] == pytest.approx((20.0 + 60.0) / 2)
    assert out[2] == pytest.approx(10.0)
    assert out[3] == pytest.approx(10.0)
    assert out[4] == pytest.approx(7.0)
    assert out[5] == pytest.approx(5.0)
