"""Alternative source formats — JSON-lines and CSV event ingestion.

The reference ingests newline-CSV only (TextIO + ParseEventFn,
UserScore.java:68-88); a complete engine also takes the same events as
JSON lines and schema'd CSV. Both readers here follow the S1/P1 rules:

- **explicit schema, never inference** — schema inference is a full
  extra pass over the data (a 100 TB pre-read) and makes the pipeline's
  types depend on whatever sample Spark peeked at;
- **malformed rows are dropped and countable, not fatal** — PERMISSIVE
  mode routes bad rows to ``_corrupt_record`` (JSON) / null-filled rows
  (CSV with a strict schema), which the caller filters and counts,
  mirroring the reference's ParseErrors counter (M1).

Both readers work identically under ``spark.readStream`` (pass
``streaming=True``) — the schema argument is mandatory for streams
anyway, so the batch/stream plans match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Wire schema of a game event as JSON/CSV: the reference's four CSV
#: fields (UserScore.java:77-82) with their parsed types.
GAME_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("team", T.StringType()),
        T.StructField("score", T.IntegerType()),
        T.StructField("timestamp", T.LongType()),
    ]
)


def read_events_json(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """JSON-lines game events with drop-and-count malformed handling.

    Returns rows matching ``parse_game_events`` output: (user, team,
    score, timestamp), malformed lines removed. Count them by comparing
    ``count()`` against the raw line count, or read with
    ``with_corrupt=True`` semantics via ``_corrupt_record`` upstream.
    """
    schema = T.StructType(
        GAME_EVENT_SCHEMA.fields + [T.StructField("_corrupt_record", T.StringType())]
    )
    reader = spark.readStream if streaming else spark.read
    df = (
        reader.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return df.filter(
        F.col("_corrupt_record").isNull()
        & F.col("user").isNotNull()
        & F.col("team").isNotNull()
        & F.col("score").isNotNull()
        & F.col("timestamp").isNotNull()
    ).drop("_corrupt_record")


def read_events_csv(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """Schema'd CSV game events (header-less, the injector's wire format).

    Unlike the text+parse path this uses Spark's native CSV reader —
    vectorized parsing, and unparseable fields become nulls which are
    dropped below (P1 semantics). Extra trailing columns are ignored by
    the schema projection.
    """
    reader = spark.readStream if streaming else spark.read
    df = (
        reader.schema(GAME_EVENT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("ignoreTrailingWhiteSpace", "true")
        .csv(path)
    )
    return df.filter(
        F.col("user").isNotNull()
        & F.col("team").isNotNull()
        & F.col("score").isNotNull()
        & F.col("timestamp").isNotNull()
    )


def write_events_orc(df: DataFrame, path: str, compression: str = "zstd") -> None:
    """Write game events as ORC — the columnar archive format for event
    logs that stay in the warehouse (predicate pushdown + built-in
    bloom-filter support on ORC readers make it a drop-in peer of
    parquet for the S1 scan path). Columns follow GAME_EVENT_SCHEMA.
    """
    df.select("user", "team", "score", "timestamp").write.mode(
        "overwrite"
    ).option("compression", compression).orc(path)


def read_events_orc(
    spark: SparkSession, path: str, streaming: bool = False
) -> DataFrame:
    """ORC game events with the explicit wire schema (never inference —
    the S1 rule; for streams the schema is mandatory anyway, so batch
    and stream plans match). Nulls in any required field are dropped,
    mirroring the P1 drop-and-count contract of the other readers.
    """
    reader = spark.readStream if streaming else spark.read
    df = reader.schema(GAME_EVENT_SCHEMA).orc(path)
    return df.filter(
        F.col("user").isNotNull()
        & F.col("team").isNotNull()
        & F.col("score").isNotNull()
        & F.col("timestamp").isNotNull()
    )
