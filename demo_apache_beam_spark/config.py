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
