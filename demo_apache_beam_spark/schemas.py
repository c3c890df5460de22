"""Static schemas for every table the engine reads or writes.

The reference declares its one event schema in code (parser at
``UserScore.java:68-88``, sink schemas synthesized at
``WriteToBigQuery.java:84-93``); we centralize all schemas here as
``StructType`` constants (SURVEY.md §1.4).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference domain: the game-event record (GameActionInfo,
# UserScore.java:31-66). Beam stores Integer score; the engine standardizes
# aggregate outputs on long (SURVEY.md §2.5 A1).
GAME_EVENT = T.StructType(
    [
        T.StructField("user", T.StringType(), True),
        T.StructField("team", T.StringType(), True),
        T.StructField("score", T.IntegerType(), True),
        T.StructField("timestamp", T.LongType(), True),  # epoch millis
    ]
)

#: Raw CSV line form (TextIO.read / Pub/Sub payload): one string column.
RAW_LINE = T.StructType([T.StructField("value", T.StringType(), True)])

# --- Driver-provided tables (TESTDATA.md / FIXTURES.md §2) ---
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),  # JSON
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), True),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("label", T.IntegerType(), True),
    ]
)

#: Multimodal blob table (engine extension): opaque binary payload + typed
#: metadata, the 100 TB-scale layout for image/audio/video corpora.
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
)

ALL_TABLES = TPCH_TABLES + ("events", "documents", "embeddings")
