"""Backfill pipeline (pipelines/backfill.py): range-scoped recompute into
the idempotent windowed table — only partitions inside the range change."""

from __future__ import annotations

import os

BASE_MS = 1700000000000  # 2023-11-14 22:13:20 UTC (window :00 at 22:00)
HOUR_MS = 3_600_000


def _write(path, name, lines):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _line(user, team, score, ts_ms):
    return f"{user},{team},{score},{ts_ms},x"


def test_backfill_rewrites_only_windows_in_range(spark, tmp_path):
    from demo_apache_beam_spark.pipelines.backfill import run

    in_dir, out = str(tmp_path / "in"), str(tmp_path / "table")
    # two hourly windows: w1 = 22:00, w2 = 23:00 (UTC)
    _write(in_dir, "a.txt", [
        _line("u1", "team_a", 3, BASE_MS),
        _line("u2", "team_a", 4, BASE_MS + 10 * 60_000),
        _line("u3", "team_b", 5, BASE_MS + HOUR_MS),
    ])
    # full-range initial build (parse_bound format: yyyy-MM-dd-HH-mm UTC)
    run(spark, f"{in_dir}/*.txt", out, "2023-11-14-22-00", "2023-11-15-00-00")
    first = {
        (r["window_start"], r["team"], r["total_score"])
        for r in spark.read.parquet(out).collect()
    }
    assert first == {
        ("2023-11-14 22:00:00.000", "team_a", 7),
        ("2023-11-14 23:00:00.000", "team_b", 5),
    }

    # corrected source for w2 only; re-backfill JUST that hour
    _write(in_dir, "a.txt", [
        _line("u1", "team_a", 99, BASE_MS),            # in range? no — w1 hour
        _line("u3", "team_b", 6, BASE_MS + HOUR_MS),   # corrected score
        _line("u4", "team_b", 1, BASE_MS + HOUR_MS + 60_000),
    ])
    run(spark, f"{in_dir}/*.txt", out, "2023-11-14-23-00", "2023-11-15-00-00")
    got = {
        (r["window_start"], r["team"], r["total_score"])
        for r in spark.read.parquet(out).collect()
    }
    # w1 untouched (the 99 was outside the backfill range); w2 replaced
    assert got == {
        ("2023-11-14 22:00:00.000", "team_a", 7),
        ("2023-11-14 23:00:00.000", "team_b", 7),
    }


def test_backfill_equals_batch_pipeline(spark, tmp_path):
    """The backfilled table must equal the hourly batch pipeline's answer
    over the same rows — one aggregate definition, no second codepath."""
    from demo_apache_beam_spark.pipelines.backfill import backfill_team_windows
    from demo_apache_beam_spark.pipelines.hourly_team_score import run_on_lines

    lines = spark.createDataFrame(
        [(_line(f"u{i}", f"team_{i % 3}", i, BASE_MS + i * 7 * 60_000),)
         for i in range(30)],
        "value string",
    )
    bf = {
        (r["window_start"], r["team"], r["total_score"])
        for r in backfill_team_windows(lines, BASE_MS, BASE_MS + 4 * HOUR_MS).collect()
    }
    # run_on_lines bounds are strict-exclusive (F1/F2); start-1 makes the
    # integral-ms comparison equivalent to backfill's inclusive start
    batch = {
        (r["window_start"], r["team"], r["total_score"])
        for r in run_on_lines(lines, 60, BASE_MS - 1, BASE_MS + 4 * HOUR_MS).collect()
    }
    assert bf == batch and len(bf) > 3
