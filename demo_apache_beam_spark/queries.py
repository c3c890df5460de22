"""Query registry: every engine capability as a (Spark query, DuckDB oracle)
pair — the driver contract (``__spark_entry__.py``) and the in-repo parity
tests both read this registry.

Conventions (hash parity with the oracle):

- every computed column is aliased identically in Spark and SQL;
- double sums go through decimal accumulation (``stable_sum``) so results
  are bit-identical regardless of partitioning / engine;
- timestamps cross the comparison boundary as formatted strings or epoch
  numbers, never raw timestamps, except where whole-second values make the
  comparison exact either way;
- role mapping of the driver's ``events`` table onto the reference's game
  events (FIXTURES.md §2): user_id→user, event_type→team,
  floor(value)→score(int), ts→event time.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.aggregate import stable_sum, sum_scores, windowed_sum_scores
from .operators.filters import filter_time_range
from .operators.parse import events_to_game_lines, parse_game_events, with_corrupt_lines
from .operators.windows import with_event_time
from .sources.tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _game_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table in game-event shape (user, team, score int, ts millis)."""
    return _events(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("user"),
        F.col("event_type").alias("team"),
        F.floor("value").cast("int").alias("score"),
        (F.unix_micros("ts") / F.lit(1000)).cast("long").alias("timestamp"),
    )


# SQL fragment mirroring _game_events for the oracles.
_GAME_EVENTS_SQL = """
  SELECT cast(user_id AS VARCHAR) AS user_key,
         event_type AS team,
         cast(floor(value) AS INTEGER) AS score,
         epoch_ms(ts) AS ts_ms
  FROM events
"""


# ---------------------------------------------------------------------------
# Reference parity — UserScore (A1/A2, UserScore.java:90-109,133-149)
# ---------------------------------------------------------------------------

@register(
    "user_score",
    f"""
    WITH game AS ({_GAME_EVENTS_SQL})
    SELECT user_key, cast(sum(score) AS BIGINT) AS total_score
    FROM game GROUP BY user_key
    """,
    doc="Per-user lifetime score totals — the flagship UserScore query.",
)
def user_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    game = _game_events(spark, sf_dir).withColumnRenamed("user", "user_key")
    return sum_scores(game, "user_key")


@register(
    "team_score",
    f"""
    WITH game AS ({_GAME_EVENTS_SQL})
    SELECT team, cast(sum(score) AS BIGINT) AS total_score
    FROM game GROUP BY team
    """,
    doc="Per-team lifetime totals (ExtractAndSumScore keyed by team, P2 default branch).",
)
def team_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sum_scores(_game_events(spark, sf_dir), "team")


# ---------------------------------------------------------------------------
# Reference parity — HourlyTeamScore (F1/F2 + W1/W2 + A2)
# ---------------------------------------------------------------------------

# Strict-exclusive bounds inside the events table's Jan-2024 span.
_START_MS = 1704844800000  # 2024-01-10 00:00:00 UTC
_STOP_MS = 1705708800000   # 2024-01-20 00:00:00 UTC


@register(
    "hourly_team_score",
    f"""
    WITH game AS ({_GAME_EVENTS_SQL})
    SELECT team,
           cast(sum(score) AS BIGINT) AS total_score,
           strftime(date_trunc('hour', make_timestamp(ts_ms * 1000)),
                    '%Y-%m-%d %H:%M:%S') || '.000' AS window_start
    FROM game
    WHERE ts_ms > {_START_MS} AND ts_ms < {_STOP_MS}
    GROUP BY team, window_start
    """,
    doc="Per-team totals in 60-min tumbling event-time windows with strict "
        "time-range bounds — the HourlyTeamScore pipeline.",
)
def hourly_team_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    game = _game_events(spark, sf_dir)
    game = filter_time_range(game, "timestamp", _START_MS, _STOP_MS)
    game = with_event_time(game)
    out = windowed_sum_scores(game, "team", 60)
    return out.select(
        "team",
        "total_score",
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss.SSS").alias("window_start"),
    )


@register(
    "time_filtered_user_score",
    f"""
    WITH game AS ({_GAME_EVENTS_SQL})
    SELECT user_key, cast(sum(score) AS BIGINT) AS total_score
    FROM game WHERE ts_ms > {_START_MS} AND ts_ms < {_STOP_MS}
    GROUP BY user_key
    """,
    doc="F1/F2 strict-exclusive time bounds feeding the per-user sum.",
)
def time_filtered_user_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    game = _game_events(spark, sf_dir).withColumnRenamed("user", "user_key")
    game = filter_time_range(game, "timestamp", _START_MS, _STOP_MS)
    return sum_scores(game, "user_key")


# ---------------------------------------------------------------------------
# Reference parity — P1 parser (round-trip through injector-format CSV lines
# with corrupt rows injected; UserScore.java:68-88, Injector.java:176-179)
# ---------------------------------------------------------------------------

_CORRUPT_SQL_VALUES = """
  SELECT 'THIS LINE REPRESENTS CORRUPT DATA AND WILL CAUSE A PARSE ERROR' AS value
  UNION ALL SELECT 'user6_AmberDingo,AmberDingo'
  UNION ALL SELECT 'user0_X,X,notanumber,1446760906000'
  UNION ALL SELECT 'user0_X,X,12,notatimestamp'
"""


@register(
    "parse_events",
    f"""
    WITH lines AS (
      SELECT cast(user_id AS VARCHAR) || ',' || event_type || ','
             || cast(cast(floor(value) AS INTEGER) AS VARCHAR) || ','
             || cast(epoch_ms(ts) AS VARCHAR) || ',ignored-trailing-col' AS value
      FROM events
      UNION ALL {_CORRUPT_SQL_VALUES}
    ), parsed AS (
      SELECT trim(split_part(value, ',', 1)) AS user_key,
             trim(split_part(value, ',', 2)) AS team,
             try_cast(split_part(value, ',', 3) AS INTEGER) AS score,
             try_cast(split_part(value, ',', 4) AS BIGINT) AS ts_ms
      FROM lines
    )
    SELECT team,
           cast(sum(score) AS BIGINT) AS total_score,
           count(*) AS n_events
    FROM parsed
    WHERE user_key IS NOT NULL AND team IS NOT NULL
      AND score IS NOT NULL AND ts_ms IS NOT NULL
    GROUP BY team
    """,
    doc="P1 parse: events → injector CSV lines (+corrupt rows) → parse → "
        "drop-and-count malformed → per-team totals.",
)
def parse_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    lines = with_corrupt_lines(events_to_game_lines(_events(spark, sf_dir)))
    parsed = parse_game_events(lines)
    return parsed.groupBy("team").agg(
        F.sum("score").cast("long").alias("total_score"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# Reference parity — LeaderBoard final-state equivalents (A3/A4).  The
# streaming execution is exercised in tests/test_streaming.py; the oracle
# checks the final accumulated state, which must equal the batch answer
# (SURVEY.md §4.3).
# ---------------------------------------------------------------------------

@register(
    "leaderboard_team_windows",
    f"""
    WITH game AS ({_GAME_EVENTS_SQL})
    SELECT team,
           cast(sum(score) AS BIGINT) AS total_score,
           strftime(date_trunc('hour', make_timestamp(ts_ms * 1000)),
                    '%Y-%m-%d %H:%M:%S') || '.000' AS window_start
    FROM game
    GROUP BY team, window_start
    """,
    doc="CalculateTeamScores final state: 60-min windowed team totals "
        "(streaming update-mode accumulation converges to this).",
)
def leaderboard_team_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    game = with_event_time(_game_events(spark, sf_dir))
    out = windowed_sum_scores(game, "team", 60)
    return out.select(
        "team",
        "total_score",
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss.SSS").alias("window_start"),
    )


@register(
    "leaderboard_user_totals",
    f"""
    WITH game AS ({_GAME_EVENTS_SQL})
    SELECT user_key, cast(sum(score) AS BIGINT) AS total_score
    FROM game GROUP BY user_key
    """,
    doc="CalculateUserScores final state: global-window running user totals.",
)
def leaderboard_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    game = _game_events(spark, sf_dir).withColumnRenamed("user", "user_key")
    return sum_scores(game, "user_key")


# ---------------------------------------------------------------------------
# Public accessors consumed by __spark_entry__.py
# ---------------------------------------------------------------------------

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}
