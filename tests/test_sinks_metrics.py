"""K1/K2/K5 sink golden tests + M1 ParseErrors counter (SURVEY.md §5.2
item 4: golden files for the text-sink formatting with deterministic
column order — the intentional fix of the reference's HashMap-ordered
rows, WriteToText.java:62-67 / UserScore.java:126-127)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Observation
from pyspark.sql import types as T

from demo_apache_beam_spark.functions.sinks import (
    format_rows,
    schema_from_spec,
    write_text,
    write_windowed_text,
)
from demo_apache_beam_spark.operators.parse import (
    CORRUPT_LINES,
    parse_game_events,
    with_corrupt_lines,
)


def _totals_df(spark):
    return spark.createDataFrame(
        [("user0_AmberDingo", 18), ("user1_RubyKoala", 5)],
        "user string, total_score long",
    )


def test_format_rows_golden(spark):
    rows = {r["value"] for r in format_rows(_totals_df(spark)).collect()}
    # exact reference row shape "k: v, k: v" (WriteToText.java:64-67) with
    # deterministic declared column order
    assert rows == {
        "user: user0_AmberDingo, total_score: 18",
        "user: user1_RubyKoala, total_score: 5",
    }


def test_format_rows_explicit_column_order(spark):
    rows = {
        r["value"]
        for r in format_rows(_totals_df(spark), ["total_score", "user"]).collect()
    }
    assert rows == {
        "total_score: 18, user: user0_AmberDingo",
        "total_score: 5, user: user1_RubyKoala",
    }


def test_write_text_unwindowed(spark, tmp_path):
    out = str(tmp_path / "out")
    write_text(_totals_df(spark), out, num_shards=2)
    files = glob.glob(f"{out}/part-*")
    assert len(files) == 2  # K1 shard count
    lines = set()
    for f in files:
        lines |= set(open(f).read().splitlines())
    assert lines == {
        "user: user0_AmberDingo, total_score: 18",
        "user: user1_RubyKoala, total_score: 5",
    }


def test_write_windowed_text_one_fileset_per_window(spark, tmp_path):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "team_a", i) for i in range(20)
        ] + [
            ("2024-01-01 01:00:00", "team_b", i) for i in range(20)
        ],
        "window_start string, team string, total_score long",
    )
    out = str(tmp_path / "outw")
    write_windowed_text(df, out, num_shards=3)
    windows = sorted(d for d in os.listdir(out) if d.startswith("window_start="))
    assert len(windows) == 2  # K2: one directory (file set) per window
    for w in windows:
        parts = glob.glob(f"{out}/{w}/part-*")
        assert 1 <= len(parts) <= 3  # up to numShards files per window
        rows = [ln for p in parts for ln in open(p).read().splitlines()]
        assert len(rows) == 20
        # window column lives in the directory name, not the row body
        assert all(ln.startswith("team: ") for ln in rows)


def test_schema_from_spec_k5():
    schema = schema_from_spec(
        {"user": "STRING", "total_score": "INTEGER", "ts": "timestamp", "raw": "binary"}
    )
    assert schema == T.StructType(
        [
            T.StructField("user", T.StringType(), True),
            T.StructField("total_score", T.IntegerType(), True),
            T.StructField("ts", T.TimestampType(), True),
            T.StructField("raw", T.BinaryType(), True),
        ]
    )
    with pytest.raises(KeyError):
        schema_from_spec({"x": "geometry"})


def test_parse_errors_observation_m1(spark):
    """M1 (Metrics.counter("main","ParseErrors"), UserScore.java:71,84):
    the observation must count exactly the dropped rows."""
    good = [
        ("user0_A,A,5,1700000000000,ignored",),
        ("user1_B,B,7,1700000001000",),
    ]
    lines = with_corrupt_lines(spark.createDataFrame(good, "value string"))
    obs = Observation("parse")
    parsed = parse_game_events(lines, observation=obs)
    n_ok = parsed.count()  # action → observation is populated
    assert n_ok == len(good)
    metrics = obs.get
    assert metrics["parse_errors"] == len(CORRUPT_LINES)
    assert metrics["lines_seen"] == len(good) + len(CORRUPT_LINES)


def test_parse_errors_via_user_score_pipeline(spark):
    """The pipeline surfaces the counter alongside results
    (UserScore.run_on_lines returns the Observation)."""
    from demo_apache_beam_spark.pipelines.user_score import run_on_lines

    lines = with_corrupt_lines(
        spark.createDataFrame(
            [("u_A,A,5,1700000000000",), ("u_A,A,2,1700000060000",)], "value string"
        )
    )
    totals, obs = run_on_lines(lines)
    assert {(r["user"], r["total_score"]) for r in totals.collect()} == {("u_A", 7)}
    assert obs.get["parse_errors"] == len(CORRUPT_LINES)

def test_bucketed_join_skips_shuffle(spark, tmp_path):
    """write_bucketed: two tables bucketed on the join key with equal bucket
    counts join with ZERO exchanges — the scan's bucket layout satisfies the
    join's required distribution (the co-located-join ingest contract)."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.functions.sinks import write_bucketed

    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(500).select(
        F.col("id").alias("k"), (F.col("id") + 7).alias("b")
    )
    write_bucketed(left, "bk_left", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "bk_left"))
    write_bucketed(right, "bk_right", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "bk_right"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("bk_left").join(spark.table("bk_right"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        assert joined.count() == 500
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_register_bucketed_table_validates_existing_spec(spark, tmp_path):
    """Re-attaching a bucketed store must serve an EXISTING catalog table
    only when its location, bucket columns, and bucket count match the
    arguments — a stale or differently-specced table served silently
    would make 'exchange-free' joins produce wrong results (ADVICE r8).
    Matching spec: served; any mismatch: ValueError naming the drift."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.functions.sinks import (
        register_bucketed_table,
        write_bucketed,
    )

    path = str(tmp_path / "rbt_store")
    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    try:
        write_bucketed(df, "rbt_tbl", ["k"], 8, sort_cols=["k"], path=path)
        # matching spec on the already-registered name: served, no error
        t = register_bucketed_table(
            spark, "rbt_tbl", path, ["k"], 8, sort_cols=["k"]
        )
        assert t.count() == 100
        # each drifted argument raises and names the mismatch
        with _pytest.raises(ValueError, match="num buckets"):
            register_bucketed_table(spark, "rbt_tbl", path, ["k"], 16)
        with _pytest.raises(ValueError, match="bucket columns"):
            register_bucketed_table(spark, "rbt_tbl", path, ["v"], 8)
        with _pytest.raises(ValueError, match="location"):
            register_bucketed_table(
                spark, "rbt_tbl", str(tmp_path / "elsewhere"), ["k"], 8
            )
        with _pytest.raises(ValueError, match="sort columns"):
            register_bucketed_table(
                spark, "rbt_tbl", path, ["k"], 8, sort_cols=["v"]
            )
        # omitting sort_cols skips sort validation (caller didn't claim one)
        assert register_bucketed_table(
            spark, "rbt_tbl", path, ["k"], 8
        ).count() == 100
        # Spark resolves columns case-insensitively — a request differing
        # only in case must be served, not rejected (ADVICE r9)
        assert register_bucketed_table(
            spark, "rbt_tbl", path, ["K"], 8, sort_cols=["K"]
        ).count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS rbt_tbl")


def test_partitioned_write_prunes(spark, tmp_path):
    """write_partitioned: a filter on the partition column shows up as
    PartitionFilters on the scan and reads only the matching directory."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.functions.sinks import write_partitioned

    df = spark.range(1000).select(
        F.col("id"),
        (F.col("id") % 4).alias("day"),
    )
    path = str(tmp_path / "part_ds")
    write_partitioned(df, path, ["day"])

    back = spark.read.parquet(path).filter(F.col("day") == 2)
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan or "PartitionFilters: [(day" in plan, plan
    assert back.count() == 250
    # only the day=2 directory is in the scan's selected partitions
    import os
    assert sorted(d for d in os.listdir(path) if d.startswith("day=")) == [
        "day=0", "day=1", "day=2", "day=3"
    ]


def test_json_event_source_drops_corrupt(spark, tmp_path):
    """JSON-lines source: valid rows parse with the explicit schema (no
    inference pass), malformed lines and wrong-typed fields drop silently
    — P1 semantics on a second wire format."""
    import json as _json

    from demo_apache_beam_spark.sources.formats import read_events_json

    p = tmp_path / "events.jsonl"
    rows = [
        {"user": "u1", "team": "t1", "score": 5, "timestamp": 1700000000000},
        {"user": "u2", "team": "t1", "score": 7, "timestamp": 1700000060000},
    ]
    lines = [_json.dumps(r) for r in rows]
    lines.append("{not json at all")
    lines.append(_json.dumps({"user": "u3", "team": "t1"}))  # missing fields
    p.write_text("\n".join(lines) + "\n")

    got = {
        (r["user"], r["team"], r["score"], r["timestamp"])
        for r in read_events_json(spark, str(p)).collect()
    }
    assert got == {
        ("u1", "t1", 5, 1700000000000),
        ("u2", "t1", 7, 1700000060000),
    }


def test_csv_event_source_matches_text_parser(spark, tmp_path):
    """Native CSV reader must produce exactly what the text+parse path
    produces on injector-format lines, including dropping corrupt rows."""
    from demo_apache_beam_spark.operators.parse import parse_game_events
    from demo_apache_beam_spark.sources.formats import read_events_csv

    lines = [
        "u1,t1,5,1700000000000,2023-11-14 22:13:20.000",
        "u2,t2,7,1700000060000,2023-11-14 22:14:20.000",
        "THIS LINE REPRESENTS CORRUPT DATA AND WILL CAUSE A PARSE ERROR",
        "u3,t1,notanumber,1700000000000",
    ]
    p = tmp_path / "events.csv"
    p.write_text("\n".join(lines) + "\n")

    via_csv = {
        tuple(r) for r in read_events_csv(spark, str(p))
        .select("user", "team", "score", "timestamp").collect()
    }
    via_text = {
        tuple(r) for r in parse_game_events(
            spark.createDataFrame([(s,) for s in lines], "value string")
        ).select("user", "team", "score", "timestamp").collect()
    }
    assert via_csv == via_text == {
        ("u1", "t1", 5, 1700000000000),
        ("u2", "t2", 7, 1700000060000),
    }


def test_idempotent_windowed_sink_replay_is_noop(spark, tmp_path):
    """Exactly-once via dynamic partition overwrite: re-writing the same
    batch (foreachBatch epoch replay after a crash) must not duplicate
    rows, and an overlapping later batch must upsert its windows while
    leaving untouched windows intact."""
    from demo_apache_beam_spark.streaming.idempotent import (
        write_windowed_idempotent,
    )

    path = str(tmp_path / "t")
    b1 = spark.createDataFrame(
        [("w1", "team_a", 10), ("w1", "team_b", 5), ("w2", "team_a", 7)],
        "window_start string, team string, total_score long",
    )
    write_windowed_idempotent(b1, path)
    write_windowed_idempotent(b1, path)  # epoch replay
    got = {(r["window_start"], r["team"], r["total_score"])
           for r in spark.read.parquet(path).collect()}
    assert got == {("w1", "team_a", 10), ("w1", "team_b", 5), ("w2", "team_a", 7)}

    # later batch: w2 accumulates more score, w3 appears; w1 untouched
    b2 = spark.createDataFrame(
        [("w2", "team_a", 9), ("w3", "team_c", 1)],
        "window_start string, team string, total_score long",
    )
    write_windowed_idempotent(b2, path)
    got = {(r["window_start"], r["team"], r["total_score"])
           for r in spark.read.parquet(path).collect()}
    assert got == {
        ("w1", "team_a", 10), ("w1", "team_b", 5),
        ("w2", "team_a", 9), ("w3", "team_c", 1),
    }


def test_idempotent_sink_under_streaming_replay(spark, tmp_path):
    """End-to-end: the LeaderBoard team stream writing through the
    idempotent sink produces the same table whether each epoch runs once
    or the sink is invoked twice per epoch (simulated redelivery)."""
    import os

    from demo_apache_beam_spark.streaming.idempotent import (
        write_windowed_idempotent,
    )
    from demo_apache_beam_spark.streaming.leaderboard import (
        calculate_team_scores,
        read_game_event_lines,
    )

    in_dir = str(tmp_path / "in"); os.makedirs(in_dir)
    base_ms = 1700000000000
    with open(os.path.join(in_dir, "a.txt"), "w") as f:
        f.write("\n".join(
            f"u{i},team_a,{i},{base_ms + i * 60_000},x" for i in range(5)
        ) + "\n")

    events = read_game_event_lines(spark, in_dir)
    out = str(tmp_path / "table")

    def sink(batch_df, _epoch):
        shaped = batch_df.selectExpr(
            "cast(window_start AS STRING) AS window_start",
            "team", "total_score",
        )
        write_windowed_idempotent(shaped, out)
        write_windowed_idempotent(shaped, out)  # redelivery of the epoch

    q = (
        calculate_team_scores(events, team_window_minutes=60)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable(); q.stop()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1  # one window, one team — no duplicates
    assert rows[0]["total_score"] == sum(range(5))
