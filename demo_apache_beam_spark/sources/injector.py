"""S3/S4/S5 — seeded game-event generator (Injector equivalent).

Reimplements the reference load generator's *statistical model*
(injector/Injector.java:21-319) as a deterministic, virtual-clock Python
generator — not a port of its Pub/Sub plumbing:

- 15 live teams (NUM_LIVE_TEAMS, Injector.java:54), names =
  color + animal (Injector.java:32-43,134), 5-19 members
  (Injector.java:55-56,78), each expiring 20-39 minutes after creation
  and replaced on first touch past expiry (Injector.java:62-63,115-130);
- ~1/3 of teams carry a robot player (ROBOT_PROBABILITY=3,
  Injector.java:53,137-139) who produces an outsized share of that
  team's events (robot chosen with p = 1/(members/2),
  Injector.java:160-173) — the designed hot key;
- scores uniform 0-19 (MAX_SCORE, Injector.java:57,174);
- every LATE_DATA_RATE-th batch delays one event 5-10 minutes
  (Injector.java:58-60,288-292) — late data within the 120-min horizon;
- rare corrupt lines exercising the parser's drop-and-count path
  (Injector.java:158,176-179);
- event time truncated to whole seconds and a PST-formatted readable
  date appended (addTimeInfoToEvent, Injector.java:184-191);
- designed load 800-1000 events per 500 ms loop ≈ 1,600-2,000 events/s
  (MIN_QPS/QPS_RANGE/THREAD_SLEEP_MS, Injector.java:28-30,296,316) —
  the BASELINE.md streaming throughput floor.

Differences (intentional): a virtual clock advances at the designed QPS
instead of wall time, so output is reproducible from the seed alone; the
corrupt-line rate is a parameter (the reference's 1/900,000 would almost
never fire in test-sized runs).
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta, timezone

COLORS = [
    "Magenta", "AliceBlue", "Almond", "Amaranth", "Amber",
    "Amethyst", "AndroidGreen", "AntiqueBrass", "Fuchsia", "Ruby", "AppleGreen",
    "Apricot", "Aqua", "ArmyGreen", "Asparagus", "Auburn", "Azure", "Banana",
    "Beige", "Bisque", "BarnRed", "BattleshipGrey",
]
ANIMALS = [
    "Echidna", "Koala", "Wombat", "Marmot", "Quokka", "Kangaroo", "Dingo", "Numbat", "Emu",
    "Wallaby", "CaneToad", "Bilby", "Possum", "Cassowary", "Kookaburra", "Platypus",
    "Bandicoot", "Cockatoo", "Antechinus",
]

NUM_ROBOTS = 20
ROBOT_PROBABILITY = 3
NUM_LIVE_TEAMS = 15
BASE_MEMBERS_PER_TEAM = 5
MEMBERS_PER_TEAM = 15
MAX_SCORE = 20
LATE_DATA_RATE = 5 * 60 * 2  # one late event ~every 600 batches
BASE_DELAY_MS = 5 * 60 * 1000
FUZZY_DELAY_MS = 5 * 60 * 1000
BASE_TEAM_EXPIRATION_MINS = 20
TEAM_EXPIRATION_MINS = 20
MIN_QPS = 800
QPS_RANGE = 200
THREAD_SLEEP_MS = 500

CORRUPT_LINE = "THIS LINE REPRESENTS CORRUPT DATA AND WILL CAUSE A PARSE ERROR"

# PST in the reference is a fixed-offset legacy TZ (UTC-8); a fixed offset
# keeps formatting deterministic without OS tzdata.
_PST = timezone(timedelta(hours=-8))


class _TeamInfo:
    __slots__ = ("name", "start_ms", "expiration_mins", "robot", "num_members")

    def __init__(self, name: str, start_ms: int, robot: str | None, rng: random.Random):
        self.name = name
        self.start_ms = start_ms
        self.expiration_mins = rng.randrange(TEAM_EXPIRATION_MINS) + BASE_TEAM_EXPIRATION_MINS
        self.robot = robot
        self.num_members = rng.randrange(MEMBERS_PER_TEAM) + BASE_MEMBERS_PER_TEAM

    @property
    def end_ms(self) -> int:
        return self.start_ms + self.expiration_mins * 60_000

    def random_user(self, rng: random.Random) -> str:
        return f"user{rng.randrange(self.num_members)}_{self.name}"


class Injector:
    """Deterministic event-line generator with the reference's model."""

    def __init__(
        self,
        seed: int = 42,
        start_ms: int = 1700000000000,
        corrupt_rate: int = 0,
    ) -> None:
        self._rng = random.Random(seed)
        self._now_ms = start_ms
        self._corrupt_rate = corrupt_rate
        self._teams: list[_TeamInfo] = []
        for _ in range(NUM_LIVE_TEAMS):
            self._add_team()

    # -- team lifecycle (Injector.java:115-151) ----------------------------

    def _add_team(self) -> _TeamInfo:
        name = self._rng.choice(COLORS) + self._rng.choice(ANIMALS)
        robot = (
            f"Robot-{self._rng.randrange(NUM_ROBOTS)}"
            if self._rng.randrange(ROBOT_PROBABILITY) == 0
            else None
        )
        team = _TeamInfo(name, self._now_ms, robot, self._rng)
        self._teams.append(team)
        return team

    def _random_team(self) -> _TeamInfo:
        idx = self._rng.randrange(len(self._teams))
        team = self._teams[idx]
        if team.end_ms < self._now_ms:
            del self._teams[idx]
            return self._add_team()
        return team

    # -- event generation (Injector.java:154-191) --------------------------

    def _event_line(self, delay_ms: int) -> str:
        team = self._random_team()
        if team.robot is not None and self._rng.randrange(max(1, team.num_members // 2)) == 0:
            user = team.robot  # the hot key
        else:
            user = team.random_user(self._rng)
        body = f"{user},{team.name},{self._rng.randrange(MAX_SCORE)}"
        if self._corrupt_rate and self._rng.randrange(self._corrupt_rate) == 0:
            body = CORRUPT_LINE
        event_ms = (self._now_ms - delay_ms) // 1000 * 1000  # whole-second truncation
        readable = datetime.fromtimestamp(self._now_ms / 1000, tz=_PST).strftime(
            "%Y-%m-%d %H:%M:%S.%f"
        )[:-3]
        return f"{body},{event_ms},{readable}"

    def batches(self, num_batches: int):
        """Yield lists of lines, one list per 500 ms publish loop
        (Injector.java:296-316): 800-1000 events per batch, virtual clock
        advancing 500 ms per batch, one 5-10-min-delayed event every
        LATE_DATA_RATE batches."""
        for batch_idx in range(num_batches):
            qps = MIN_QPS + self._rng.randrange(QPS_RANGE)
            n = qps // 2  # events per 500 ms loop
            lines = []
            late_slot = (
                self._rng.randrange(n) if batch_idx % LATE_DATA_RATE == LATE_DATA_RATE - 1 else -1
            )
            for i in range(n):
                delay = (
                    BASE_DELAY_MS + self._rng.randrange(FUZZY_DELAY_MS) if i == late_slot else 0
                )
                lines.append(self._event_line(delay))
                self._now_ms += max(1, THREAD_SLEEP_MS // n)
            yield lines

    def lines(self, num_events: int):
        """Yield exactly ``num_events`` lines (batch structure preserved)."""
        produced = 0
        for batch in self.batches(num_batches=2**31):
            for line in batch:
                if produced >= num_events:
                    return
                produced += 1
                yield line


def write_events_file(
    path: str, num_events: int, seed: int = 42, start_ms: int = 1700000000000,
    corrupt_rate: int = 0,
) -> int:
    """S5 file publish (publishDataToFile, Injector.java:220-239): append
    events to one local file. Returns lines written."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    inj = Injector(seed=seed, start_ms=start_ms, corrupt_rate=corrupt_rate)
    n = 0
    with open(path, "a") as f:
        for line in inj.lines(num_events):
            f.write(line + "\n")
            n += 1
    return n


def publish_to_dir(
    dirpath: str,
    num_events: int,
    events_per_file: int = 10000,
    seed: int = 42,
    start_ms: int = 1700000000000,
    corrupt_rate: int = 0,
) -> int:
    """S4 equivalent for the file streaming source: the event stream lands
    as a sequence of files (each file ≈ one publish window), which
    ``readStream.text`` consumes in order — arrival order ≠ event order
    exactly as with Pub/Sub publishes."""
    os.makedirs(dirpath, exist_ok=True)
    inj = Injector(seed=seed, start_ms=start_ms, corrupt_rate=corrupt_rate)
    written = 0
    file_idx = 0
    buf: list[str] = []
    for line in inj.lines(num_events):
        buf.append(line)
        if len(buf) >= events_per_file:
            with open(os.path.join(dirpath, f"events-{file_idx:05d}.txt"), "w") as f:
                f.write("\n".join(buf) + "\n")
            written += len(buf)
            buf, file_idx = [], file_idx + 1
    if buf:
        with open(os.path.join(dirpath, f"events-{file_idx:05d}.txt"), "w") as f:
            f.write("\n".join(buf) + "\n")
        written += len(buf)
    return written
