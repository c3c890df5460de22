"""UserScore pipeline — batch, per-user lifetime score totals
(reference entry point: UserScore.main, UserScore.java:133-149).

Dataflow:  read lines → parse (P1) → ExtractAndSumScore("user") (A2)
→ text sink (K1).  Physical plan: Scan → codegen'd Project/Filter →
partial HashAggregate → Exchange(user) → final HashAggregate → Write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession

from ..operators.aggregate import sum_scores
from ..operators.parse import parse_game_events
from ..functions.sinks import write_text


def run_on_lines(lines: DataFrame, key: str = "user") -> tuple[DataFrame, Observation]:
    """Core query on a raw-line DataFrame; returns (totals, parse metrics)."""
    obs = Observation("parse")
    events = parse_game_events(lines, observation=obs)
    return sum_scores(events, key), obs


def run(spark: SparkSession, input_glob: str, output: str) -> None:
    lines = spark.read.text(input_glob)  # S1: TextIO.read equivalent
    totals, _obs = run_on_lines(lines)
    write_text(totals, output)


def main(argv: list[str] | None = None) -> None:
    from ..config import parse_user_score_args
    from ..session import get_spark

    opts = parse_user_score_args(argv)
    run(get_spark("user-score"), opts.input, opts.output)


if __name__ == "__main__":
    main()
