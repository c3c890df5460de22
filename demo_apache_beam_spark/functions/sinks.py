"""K1-K5 — sinks (reference: WriteToText.java, WriteToBigQuery.java,
WriteWindowedToBigQuery.java).

Mapping (SURVEY.md §2.6):

- K1 unwindowed text (WriteToText.java:136-148) → formatted ``k: v`` rows
  via ``concat_ws`` (JVM-side), written as text shards.
- K2 one-file-set-per-window (WriteToText.java:73-134) →
  ``partitionBy(window_start)`` directory layout; ``repartition(3)`` inside
  each window matches the reference's ``withNumShards(3)``
  (WriteToText.java:94). Directory-per-window replaces filename mangling —
  same physical property (window-aligned output units), idiomatic for a
  distributed FS at scale.
- K3/K4 BigQuery append (WriteToBigQuery.java:95-106) → warehouse-table /
  parquet append with CREATE_IF_NEEDED + WRITE_APPEND semantics
  (``mode("append")``).
- K5 schema synthesis (WriteToBigQuery.java:84-93) → ``StructType`` from a
  column-spec dict.

Column order in text output is deterministic (the reference iterates a
HashMap — UserScore.java:126-127 — and is therefore nondeterministic; we fix
that intentionally, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def format_rows(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """P3 BuildRowFn: ``"col: value, col: value"`` text rows
    (WriteToText.java:53-70), deterministic column order."""
    cols = columns or df.columns
    pieces = []
    for i, c in enumerate(cols):
        prefix = f"{c}: " if i == 0 else f", {c}: "
        pieces.append(F.concat(F.lit(prefix), F.col(c).cast("string")))
    return df.select(F.concat(*pieces).alias("value"))


def write_text(df: DataFrame, path: str, num_shards: int | None = None, mode: str = "overwrite") -> None:
    """K1: unwindowed formatted text files."""
    out = format_rows(df)
    if num_shards:
        out = out.repartition(num_shards)
    out.write.mode(mode).text(path)


def write_windowed_text(df: DataFrame, path: str, window_col: str = "window_start",
                        num_shards: int = 3, mode: str = "overwrite") -> None:
    """K2: window-partitioned text output, up to ``num_shards`` files per
    window (WriteToText.java:89-94; hash collisions can leave a bucket
    empty, so "exactly N" is at-most-N). The window lands in the directory
    name; ``pmod`` keeps buckets in [0, num_shards) even at
    hash == Long.MIN_VALUE, where ``abs`` stays negative; repartitioning
    by (window, bucket) shards each window with no global
    single-partition bottleneck — scales to any number of windows."""
    other = [c for c in df.columns if c != window_col]
    sharded = df.withColumn("_shard", F.pmod(F.hash(*other), F.lit(num_shards)))
    sharded = sharded.repartition(F.col(window_col), F.col("_shard"))
    pieces = [
        F.concat(F.lit(f"{c}: " if i == 0 else f", {c}: "), F.col(c).cast("string"))
        for i, c in enumerate(other)
    ]
    final = sharded.select(F.concat(*pieces).alias("value"), F.col(window_col))
    final.write.mode(mode).partitionBy(window_col).text(path)


def write_table(df: DataFrame, path_or_table: str, mode: str = "append") -> None:
    """K3: warehouse append sink (CREATE_IF_NEEDED + WRITE_APPEND →
    parquet append creates the dataset on first write)."""
    if "/" in path_or_table:
        df.write.mode(mode).parquet(path_or_table)
    else:
        df.write.mode(mode).saveAsTable(path_or_table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """K3 extension — directory-partitioned parquet dataset.

    The partition columns become the directory layout; any later filter
    on them is **partition pruning** (whole directories skipped before a
    byte is read — `PartitionFilters` in the scan, verified by
    ``test_partitioned_write_prunes``). At 100 TB this is the first-order
    I/O lever: a date-partitioned event log turns a one-day query into a
    1/365th scan. Keep partition cardinality bounded (date, region —
    never user id): each partition is a directory and tiny partitions
    create a small-files problem.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """K3 extension — bucketed parquet table for shuffle-free co-located
    joins and aggregations (no reference analogue; SURVEY.md §4.4).

    This is the 100 TB ingest contract: fact tables bucketed once on
    their join key mean every later equi-join or groupBy on that key
    reads pre-partitioned data — the scan's output partitioning already
    satisfies the join's distribution requirement, so Catalyst drops the
    Exchange on each bucketed side (verified by
    ``test_bucketed_join_skips_shuffle``). ``sort_cols`` additionally
    persists an in-bucket sort, letting sort-merge joins skip their Sort
    too. Bucket counts must match across tables meant to be co-joined.
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        int(num_buckets), *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def register_bucketed_table(
    spark,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Re-attach a :func:`write_bucketed` table in a session whose
    in-memory catalog doesn't know it (a fresh process): one metadata-only
    ``CREATE TABLE ... USING parquet CLUSTERED BY ... LOCATION`` — bucket
    ids recover from the part-file names, no data pass — after which
    equi-joins/aggregations on the bucket key read it exchange-free.
    The column list comes from the store's own parquet footers, so the
    DDL never drifts from what was written.

    ``partition_cols`` (r13) re-attaches a PARTITIONED bucketed table
    (the IVM delta-correlated side layout): the DDL adds
    ``PARTITIONED BY`` and the create runs ``MSCK REPAIR TABLE`` once
    to discover the existing partition directories — appends through
    ``saveAsTable`` self-register their partitions afterwards. The
    partition columns come from directory names, so the schema read
    appends them after the footer columns, exactly as Spark infers.

    When the name already exists in the catalog, its location, bucket
    columns, and bucket count are VALIDATED against the arguments and a
    ``ValueError`` raised on mismatch (ADVICE r8): silently serving a
    stale or differently-specced table is how a wrong bucket spec turns
    an "exchange-free" join into wrong results — bucket pruning trusts
    the DDL, not the files."""
    if spark.catalog.tableExists(table_name):
        import os
        import re

        info = {
            r["col_name"]: (r["data_type"] or "")
            for r in spark.sql(
                f"DESCRIBE TABLE EXTENDED {table_name}"
            ).collect()
        }

        def _norm_loc(loc: str) -> tuple[str, str, str]:
            # compare as (scheme, authority, normalized path) — erasing
            # the scheme would let a local path validate against an
            # hdfs:/s3a: location (different filesystem, same suffix),
            # and a naive [a-z]+ scheme regex rejects digit-bearing
            # schemes like s3a (review r9). A scheme-less location is
            # the default filesystem — 'file' here, matching how the
            # session's catalog qualifies local paths.
            from urllib.parse import urlparse

            u = urlparse(loc)
            scheme = u.scheme or "file"
            p = u.path if u.scheme else loc
            return scheme, u.netloc, os.path.normpath(p or "/")

        from urllib.parse import urlparse as _up

        want_raw = path if _up(path).scheme else os.path.abspath(path)
        got_loc = _norm_loc(info.get("Location", ""))
        want_loc = _norm_loc(want_raw)
        got_bcols = re.findall(r"`([^`]+)`", info.get("Bucket Columns", ""))
        got_n = info.get("Num Buckets", "").strip()
        want_scols = list(sort_cols or [])
        got_scols = re.findall(r"`([^`]+)`", info.get("Sort Columns", ""))
        mismatches = []
        if got_loc != want_loc:
            mismatches.append(f"location {got_loc!r} != {want_loc!r}")
        # Spark resolves columns case-insensitively by default, so a
        # table bucketed on `K` must validate against a request for
        # ['k'] (ADVICE r9) — but ONLY when the session itself resolves
        # that way: under spark.sql.caseSensitive=true, `K` and `k` are
        # genuinely distinct columns and folding would serve a
        # wrong-spec table (review r10). Order still matters (bucket id
        # hashes columns in DDL order).
        case_sensitive = (
            str(spark.conf.get("spark.sql.caseSensitive", "false")).lower()
            == "true"
        )

        def _fold(cols):
            return [c if case_sensitive else c.casefold() for c in cols]

        if _fold(got_bcols) != _fold(bucket_cols):
            mismatches.append(
                f"bucket columns {got_bcols} != {list(bucket_cols)}"
            )
        if got_n != str(int(num_buckets)):
            mismatches.append(f"num buckets {got_n!r} != {num_buckets}")
        if sort_cols is not None and _fold(got_scols) != _fold(want_scols):
            mismatches.append(f"sort columns {got_scols} != {want_scols}")
        got_pcols = [
            c.name
            for c in spark.catalog.listColumns(table_name)
            if c.isPartition
        ]
        if _fold(got_pcols) != _fold(list(partition_cols or [])):
            mismatches.append(
                f"partition columns {got_pcols} != "
                f"{list(partition_cols or [])}"
            )
        if mismatches:
            raise ValueError(
                f"register_bucketed_table: catalog table {table_name!r} "
                "exists with a different spec — " + "; ".join(mismatches)
                + " (drop or rename the stale table; serving it would "
                "produce wrong exchange-free join results)"
            )
        return spark.table(table_name)
    ddl = spark.read.parquet(path)._jdf.schema().toDDL()
    bcols = ", ".join(f"`{c}`" for c in bucket_cols)
    sorted_by = (
        "SORTED BY (" + ", ".join(f"`{c}`" for c in sort_cols) + ") "
        if sort_cols
        else ""
    )
    partitioned_by = (
        "PARTITIONED BY (" + ", ".join(f"`{c}`" for c in partition_cols) + ") "
        if partition_cols
        else ""
    )
    spark.sql(
        f"CREATE TABLE {table_name} ({ddl}) USING parquet "
        f"{partitioned_by}"
        f"CLUSTERED BY ({bcols}) {sorted_by}"
        f"INTO {int(num_buckets)} BUCKETS LOCATION '{path}'"
    )
    if partition_cols:
        # discover the existing partition directories once; appends via
        # saveAsTable self-register theirs from here on
        spark.sql(f"MSCK REPAIR TABLE {table_name}")
    return spark.table(table_name)


def schema_from_spec(spec: dict[str, str]) -> T.StructType:
    """K5: synthesize a StructType from a {name: sql_type} dict — the
    engine's analogue of the reference's field-map → TableSchema
    (WriteToBigQuery.java:84-93)."""
    return T.StructType([T.StructField(n, _parse_type(t), True) for n, t in spec.items()])


def _parse_type(name: str) -> T.DataType:
    mapping = {
        "string": T.StringType(),
        "integer": T.IntegerType(),
        "int": T.IntegerType(),
        "long": T.LongType(),
        "bigint": T.LongType(),
        "double": T.DoubleType(),
        "timestamp": T.TimestampType(),
        "binary": T.BinaryType(),
        "boolean": T.BooleanType(),
    }
    return mapping[name.lower()]
