"""demo_apache_beam_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``nguyenhaitrieu10/Demo-Apache-Beam``.

The reference (survey: SURVEY.md) is the Apache Beam "mobile gaming" example
suite: per-key score aggregation over a game-event stream at three levels of
time semantics (global batch, fixed-window batch, streaming with triggers and
late data). This package re-expresses every capability Spark-first:

- ``operators/``  — parameterized DataFrame operators (parse, filter, window,
  aggregate, dedup, similarity, text analysis, multimodal)
- ``sources/``    — table loaders, CSV/event-line readers, the injector-model
  synthetic generator
- ``functions/``  — sink writers and schema synthesis (text / warehouse table)
- ``streaming/``  — Structured Streaming leaderboard queries (watermark,
  update-mode triggers, pane-timing annotation)
- ``pipelines/``  — composed end-to-end pipelines mirroring the reference
  entry points (UserScore, HourlyTeamScore, LeaderBoard)
- ``plans/``      — plan inspection / tuning helpers

Design point: correctness is tested at small scale factors, but every
operator is written for a 1000-executor cluster on ~100 TB: expression-only
inner loops (whole-stage codegen), broadcast for small dimensions, AQE for
skew, partial aggregation before every shuffle, and filters/projections that
push down to the Parquet scan.
"""

__version__ = "0.1.0"
