from .parse import parse_game_events, events_to_game_lines  # noqa: F401
from .filters import filter_time_range  # noqa: F401
from .windows import with_event_time, tumbling_window  # noqa: F401
from .aggregate import sum_scores, windowed_sum_scores, stable_sum  # noqa: F401
