"""Typed pipeline options mirroring the reference CLI surface
(PipelineOptionsFactory options — SURVEY.md §2.8), with the same defaults.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field

from .operators.filters import DEFAULT_START, DEFAULT_STOP


@dataclass
class UserScoreOptions:
    """UserScore.java:111-131."""

    input: str = "gs://apache-beam-samples/game/gaming_data*.csv"
    output: str = ""


@dataclass
class HourlyTeamScoreOptions(UserScoreOptions):
    """HourlyTeamScore.java:34-53."""

    window_duration: int = 60  # minutes
    start_min: str = DEFAULT_START  # exclusive, yyyy-MM-dd-HH-mm
    stop_min: str = DEFAULT_STOP  # exclusive


@dataclass
class LeaderBoardOptions(HourlyTeamScoreOptions):
    """LeaderBoard.java:48-73."""

    dataset: str = ""
    topic: str = ""
    team_window_duration: int = 60  # minutes
    allowed_lateness: int = 120  # minutes
    leader_board_table_name: str = "leaderboard"
    streaming: bool = field(default=True)  # LeaderBoard.java:139 forces on
    checkpoint: str = ""  # engine-side: streaming checkpoint location
    format: str = "text"  # wire format: text (injector CSV lines), json, csv


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--input", default=UserScoreOptions.input)
    p.add_argument("--output", required=True)


def parse_user_score_args(argv: list[str] | None = None) -> UserScoreOptions:
    p = argparse.ArgumentParser("user_score")
    _add_common(p)
    ns = p.parse_args(argv)
    return UserScoreOptions(input=ns.input, output=ns.output)


def parse_hourly_args(argv: list[str] | None = None) -> HourlyTeamScoreOptions:
    p = argparse.ArgumentParser("hourly_team_score")
    _add_common(p)
    p.add_argument("--windowDuration", type=int, default=60)
    p.add_argument("--startMin", default=DEFAULT_START)
    p.add_argument("--stopMin", default=DEFAULT_STOP)
    ns = p.parse_args(argv)
    return HourlyTeamScoreOptions(
        input=ns.input,
        output=ns.output,
        window_duration=ns.windowDuration,
        start_min=ns.startMin,
        stop_min=ns.stopMin,
    )


def parse_leaderboard_args(argv: list[str] | None = None) -> LeaderBoardOptions:
    """LeaderBoard option surface (LeaderBoard.java:48-73 + README.md:16-19).

    ``--input`` is the streaming source directory (the engine's stand-in
    for the Pub/Sub ``--topic``; a topic name is still accepted and
    recorded for parity). ``--output``/``--dataset`` name the warehouse
    destination; tables are written as
    ``<output>/<leaderBoardTableName>_team`` and ``_user``
    (LeaderBoard.java:159,170).
    """
    p = argparse.ArgumentParser("leaderboard")
    p.add_argument("--input", required=True, help="streaming source directory")
    p.add_argument("--output", required=True, help="warehouse/table output root")
    p.add_argument("--dataset", default="", help="dataset label (BigQuery parity)")
    p.add_argument("--topic", default="", help="source topic label (Pub/Sub parity)")
    p.add_argument("--teamWindowDuration", type=int, default=60)
    p.add_argument("--allowedLateness", type=int, default=120)
    p.add_argument("--leaderBoardTableName", default="leaderboard")
    p.add_argument("--checkpoint", default="", help="checkpoint dir (default <output>/_checkpoints)")
    p.add_argument("--format", default="text", choices=["text", "json", "csv"],
                   help="input wire format (default: injector CSV text lines)")
    ns = p.parse_args(argv)
    return LeaderBoardOptions(
        input=ns.input,
        output=ns.output,
        dataset=ns.dataset,
        topic=ns.topic,
        team_window_duration=ns.teamWindowDuration,
        allowed_lateness=ns.allowedLateness,
        leader_board_table_name=ns.leaderBoardTableName,
        checkpoint=ns.checkpoint or f"{ns.output}/_checkpoints",
        format=ns.format,
    )
