"""Table-loader contract: every parquet timestamp generation the driver has
produced must normalize to plain TimestampType whose micros equal the
stored values (DuckDB's reading under a UTC session), with predicates
still pushing to the scan."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from conftest import SF_SMALL
from demo_apache_beam_spark.sources.tables import load_table


def test_events_ts_loads_as_plain_timestamp(spark):
    df = load_table(spark, SF_SMALL, "events")
    field = {f.name: f.dataType for f in df.schema.fields}["ts"]
    assert isinstance(field, T.TimestampType), field
    # unix_micros works and matches DuckDB's epoch_us on the same file
    got = {
        r["event_id"]: r["us"]
        for r in df.select(
            "event_id", F.unix_micros("ts").alias("us")
        ).limit(50).collect()
    }
    want = dict(
        duckdb.sql(
            f"SELECT event_id, epoch_us(ts) FROM "
            f"read_parquet('{SF_SMALL}/events.parquet') "
            f"WHERE event_id IN ({','.join(map(str, got))})"
        ).fetchall()
    )
    assert got == want


def test_timestamp_ntz_parquet_roundtrip(spark, tmp_path):
    """A microsecond-unit parquet timestamp (isAdjustedToUTC=false — the
    current driver generation) must load with stored micros intact even
    though Spark 4's default would infer TIMESTAMP_NTZ."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.Timestamp("2024-03-01 12:34:56.789012")
    pq.write_table(
        pa.table({"ts": pa.array([ts], type=pa.timestamp("us")), "k": [1]}),
        str(tmp_path / "tbl.parquet"),
    )
    df = load_table(spark, str(tmp_path), "tbl")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] == ts.value // 1000  # pandas ns -> us, exact


def test_timestamp_nanos_parquet_roundtrip(spark, tmp_path):
    """The older TIMESTAMP(NANOS) generation (illegal for Spark's reader)
    must still load via the nanosAsLong + truncating DIV path for the
    name-listed columns (events.ts here)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = pd.Timestamp("2024-03-01 12:34:56.789012345")
    pq.write_table(
        pa.table({"ts": pa.array([ts], type=pa.timestamp("ns")), "k": [1]}),
        str(tmp_path / "events.parquet"),
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )
    df = load_table(spark, str(tmp_path), "events")
    assert isinstance(df.schema["ts"].dataType, T.TimestampType)
    row = df.select(F.unix_micros("ts").alias("us")).first()
    assert row["us"] == ts.value // 1000  # truncating ns -> us


def test_timestamp_predicate_pushes_to_scan(spark):
    from demo_apache_beam_spark.plans import explain_str

    df = load_table(spark, SF_SMALL, "events").filter(
        F.col("ts") >= F.timestamp_micros(F.lit(1704844800000000))
    )
    plan = explain_str(df)
    assert "GreaterThanOrEqual(ts," in plan, plan[:1500]


def test_orc_roundtrip_equals_text_parser(spark, tmp_path):
    """ORC write → read must reproduce exactly the rows the reference
    text parser yields from the same events, under the explicit wire
    schema (no inference), and the scan must push filters down."""
    from demo_apache_beam_spark.operators.parse import parse_game_events
    from demo_apache_beam_spark.sources.formats import (
        read_events_orc,
        write_events_orc,
    )

    lines = [
        "user0_A,TeamA,5,1447719060000,2015-11-16",
        "user1_B,TeamB,7,1447719120000,2015-11-16",
        "user2_C,TeamC,0,1447719180000,2015-11-16",
    ]
    parsed = parse_game_events(
        spark.createDataFrame([(s,) for s in lines], "value string")
    )
    path = str(tmp_path / "events_orc")
    write_events_orc(parsed, path)
    back = read_events_orc(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, parsed.select("user", "team", "score", "timestamp").collect())
    )
    # pushdown reaches the ORC scan
    plan = back.filter(F.col("score") > 4)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "GreaterThan(score,4)" in plan, plan
