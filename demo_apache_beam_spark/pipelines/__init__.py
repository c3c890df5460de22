from . import user_score, hourly_team_score  # noqa: F401
