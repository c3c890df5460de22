"""S3 generator tests: determinism, format, hot keys, late data, corrupt
lines, and end-to-end parseability (FIXTURES.md §1)."""

from __future__ import annotations

import collections

from demo_apache_beam_spark.sources.injector import (
    CORRUPT_LINE,
    Injector,
    LATE_DATA_RATE,
    publish_to_dir,
    write_events_file,
)

START = 1700000000000


def test_deterministic_from_seed():
    a = list(Injector(seed=7, start_ms=START).lines(5000))
    b = list(Injector(seed=7, start_ms=START).lines(5000))
    c = list(Injector(seed=8, start_ms=START).lines(5000))
    assert a == b
    assert a != c


def test_line_format_and_second_truncation():
    for line in Injector(seed=1, start_ms=START).lines(2000):
        parts = line.split(",")
        assert len(parts) == 5  # user,team,score,event_ms,readable_date
        assert 0 <= int(parts[2]) < 20  # MAX_SCORE
        ts = int(parts[3])
        assert ts % 1000 == 0  # whole-second truncation, Injector.java:186
        assert parts[0]  # user

def test_robot_hot_key_share():
    """Robot-carrying teams route ~2/members of events to the robot —
    an outsized share vs any single human member (Injector.java:160-173)."""
    by_team_user = collections.Counter()
    for line in Injector(seed=42, start_ms=START).lines(30000):
        user, team = line.split(",")[:2]
        by_team_user[(team, user)] += 1
    robots = {k: v for k, v in by_team_user.items() if k[1].startswith("Robot-")}
    assert robots, "no robot users generated"
    # for each robot team, the robot out-produces the mean human member
    for (team, robot), robot_n in robots.items():
        humans = [v for (t, u), v in by_team_user.items() if t == team and not u.startswith("Robot-")]
        if len(humans) >= 3 and robot_n >= 20:
            assert robot_n > sum(humans) / len(humans)


def test_late_data_rate_and_delay():
    inj = Injector(seed=3, start_ms=START)
    late = 0
    batches = 0
    for batch in inj.batches(2 * LATE_DATA_RATE):
        batches += 1
        for i, line in enumerate(batch):
            event_ms = int(line.split(",")[3])
            # reconstruct delay vs the virtual clock by comparing with
            # neighbors: late rows sit 5-10 min behind the batch's time
            if i > 0:
                prev_ms = int(batch[i - 1].split(",")[3])
                if prev_ms - event_ms > 4 * 60 * 1000:
                    late += 1
                    assert prev_ms - event_ms <= 11 * 60 * 1000
    assert batches == 2 * LATE_DATA_RATE
    assert late == 2  # one per LATE_DATA_RATE batches


def test_corrupt_rate_and_parser_end_to_end(spark, tmp_path):
    path = str(tmp_path / "events.txt")
    n = write_events_file(path, 5000, seed=5, corrupt_rate=500)
    assert n == 5000
    raw = open(path).read().splitlines()
    # the reference appends time info even to corrupt bodies
    # (generateEvent → addTimeInfoToEvent, Injector.java:176-191)
    corrupt = [ln for ln in raw if ln.startswith(CORRUPT_LINE)]
    assert corrupt, "corrupt_rate=500 over 5000 lines should emit corrupt lines"

    from demo_apache_beam_spark.operators.parse import parse_game_events

    lines = spark.read.text(path)
    parsed = parse_game_events(lines)
    assert parsed.count() == 5000 - len(corrupt)


def test_generator_streaming_equals_batch(spark, tmp_path):
    """Integration: generator events (robot hot keys, late rows, corrupt
    lines) through the streaming LeaderBoard converge to the batch answer
    — the skew the injector designs in is absorbed by partial
    aggregation, and corrupt lines die in the parser on both paths."""
    from pyspark.sql import functions as F

    from demo_apache_beam_spark.operators.aggregate import sum_scores
    from demo_apache_beam_spark.operators.parse import parse_game_events
    from demo_apache_beam_spark.streaming.leaderboard import (
        calculate_user_scores,
        read_game_event_lines,
    )

    in_dir = str(tmp_path / "in")
    publish_to_dir(in_dir, 8000, events_per_file=2000, seed=11, corrupt_rate=800)

    events = read_game_event_lines(spark, in_dir)
    user = calculate_user_scores(events)
    state: dict = {}

    def sink(batch_df, _epoch):
        for row in batch_df.collect():
            state[row["user"]] = row["total_score"]

    q = (
        user.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    batch = parse_game_events(spark.read.text(in_dir))
    expect = {r["user"]: r["total_score"] for r in sum_scores(batch, "user").collect()}
    assert state == expect
    assert any(u.startswith("Robot-") for u in state), "hot keys must be present"


def test_publish_to_dir_file_sequence(tmp_path):
    d = str(tmp_path / "stream")
    written = publish_to_dir(d, 2500, events_per_file=1000, seed=9)
    assert written == 2500
    import os

    files = sorted(os.listdir(d))
    assert len(files) == 3
    sizes = [len(open(os.path.join(d, f)).read().splitlines()) for f in files]
    assert sizes == [1000, 1000, 500]