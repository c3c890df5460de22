"""P1 — event-line parsing (reference: ``ParseEventFn``, UserScore.java:68-88).

Semantics preserved from the reference parser:

- split the line on ``","``;
- trim columns 0 (user) and 1 (team)  (UserScore.java:77-78);
- parse column 2 as int and column 3 as long (UserScore.java:79-80);
- a row with fewer than 4 columns or non-numeric cols 2-3 is **dropped**
  (0 outputs) and counted in a ``ParseErrors`` metric, never an error
  (UserScore.java:83-86) — the parse is a flatMap, not a map;
- trailing extra columns (the injector's ``readable_date``, col 4) are
  carried but ignored (Injector.java:184-191, parser reads cols 0-3 only).

Spark-first: the whole parse is native column expressions (split /
element_at / trim / try-cast), so it stays inside whole-stage codegen — no
Python touches the hot path. The ParseErrors counter (M1,
UserScore.java:71,84) is wired through ``df.observe``, Spark's native
metric channel, readable via a QueryExecution/streaming listener or the
``observe`` result on action.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F

#: Output column order is deterministic (intentional fix of the reference's
#: HashMap-ordered text output — SURVEY.md §1.2).
PARSED_COLUMNS = ("user", "team", "score", "timestamp")


def _parsed_fields(line: Column) -> list[Column]:
    # try_element_at / try_cast: NULL on short or non-numeric rows — the
    # columnar equivalent of the reference's catch-and-drop (ANSI-mode
    # element_at would throw, which is exactly what the parser must not do).
    parts = F.split(line, ",")
    return [
        F.trim(F.try_element_at(parts, F.lit(1))).alias("user"),
        F.trim(F.try_element_at(parts, F.lit(2))).alias("team"),
        F.try_element_at(parts, F.lit(3)).try_cast("int").alias("score"),
        F.try_element_at(parts, F.lit(4)).try_cast("long").alias("timestamp"),
    ]


def parse_game_events(
    lines: DataFrame,
    line_col: str = "value",
    observation: Observation | None = None,
) -> DataFrame:
    """CSV line → typed game event, dropping (and counting) malformed rows.

    ``element_at`` on a missing index and ``try_cast`` on garbage both yield
    NULL, so the drop predicate is simply "all four fields parsed". NULL
    never crashes — matching the reference's catch-and-drop contract.
    """
    parsed = lines.select(*_parsed_fields(F.col(line_col)))
    ok = (
        F.col("user").isNotNull()
        & F.col("team").isNotNull()
        & F.col("score").isNotNull()
        & F.col("timestamp").isNotNull()
    )
    if observation is not None:
        # M1: ParseErrors counter (Metrics.counter("main","ParseErrors")).
        parsed = parsed.observe(
            observation,
            F.sum(F.when(~ok, 1).otherwise(0)).alias("parse_errors"),
            F.count(F.lit(1)).alias("lines_seen"),
        )
    return parsed.filter(ok)


def events_to_game_lines(events: DataFrame) -> DataFrame:
    """Adapter: the driver's ``events`` table → injector-format CSV lines
    (``user,team,score,event_time_millis,readable_date``,
    Injector.java:174,184-191). Role mapping per FIXTURES.md §2:
    user_id→user, event_type→team, floor(value)→score, ts→event time.

    Used to exercise the parser end-to-end against the oracle: build lines,
    parse them back, aggregate. ``floor`` (not cast) so Spark and the
    oracle round identically.
    """
    return events.select(
        F.concat_ws(
            ",",
            F.col("user_id").cast("string"),
            F.col("event_type"),
            F.floor("value").cast("int").cast("string"),
            (F.unix_micros("ts") / F.lit(1000)).cast("long").cast("string"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS"),
        ).alias("value")
    )


#: Corrupt fixtures mirroring the injector's deliberate bad line
#: (Injector.java:176-179) plus short / non-numeric variants — each must be
#: dropped and counted, never crash (FIXTURES.md §1).
CORRUPT_LINES = (
    "THIS LINE REPRESENTS CORRUPT DATA AND WILL CAUSE A PARSE ERROR",
    "user6_AmberDingo,AmberDingo",
    "user0_X,X,notanumber,1446760906000",
    "user0_X,X,12,notatimestamp",
)


def with_corrupt_lines(lines: DataFrame) -> DataFrame:
    spark = lines.sparkSession
    bad = spark.createDataFrame([(s,) for s in CORRUPT_LINES], "value string")
    return lines.unionAll(bad)
