"""Streaming incremental view maintenance — micro-batch refreshes of a
persisted materialized join view (r12).

``operators/ivm.py`` gives the nightly-delta contract: serial,
caller-scheduled increments. This module turns each Structured-Streaming
micro-batch into one such increment — the continuously-maintained
materialized view a warehouse keeps when the facts arrive as a stream —
while keeping the store EXACT under at-least-once delivery:

- **Replay exactness.** ``foreachBatch`` may redeliver an epoch after a
  restart; the store is append-only, so blindly re-applying would
  double-count every row of the replayed delta. Each increment
  therefore records its epoch id into ``{store}/applied`` INSIDE the
  increment's ``_INCREMENT_IN_PROGRESS`` durability marker window
  (``apply_join_increment(epoch=)``), and the ingest consults that
  ledger first: a redelivered epoch whose id is present is a COMPLETED
  increment — skipped, store bytes untouched (pinned in pytest). An id
  absent while the in-progress marker survives is the crashed case —
  the next touch raises ``IvmStoreCorrupt`` (rebuild), never a silent
  half-state. This differs from the epoch-partitioned dynamic-overwrite
  stores (dedup/linkage): their replays REWRITE a partition to the same
  bytes; an IVM increment touches four datasets non-atomically, so
  skip-if-applied is the correct idempotence discipline here.
- **Serial increments for free**: ``foreachBatch`` invokes the ingest
  one micro-batch at a time — exactly the ingest-scheduler contract the
  batch algebra documents.
- **Scale shape is inherited**: per epoch, the stored sides join
  exchange-free (bucketed scans), only the micro-batch delta shuffles,
  ``prune_col`` keeps the stored-side READ delta-correlated, and the
  optional aggregate view takes one dimension-sized negative/positive
  partial per epoch. State is the store, not engine memory — the
  stream restarts from any checkpoint and the view persists.

The streamed side is the LEFT (fact) delta; ``right_deltas`` optionally
derives the right-side delta from the same micro-batch (e.g. a
per-(key, day) profile aggregate) — both land in the same increment, so
the maintained view stays consistent with the epoch boundary.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


def make_ivm_ingest(
    spark,
    store_path: str,
    on: str | list[str],
    num_buckets: int = 8,
    prune_col: str | None = None,
    agg: tuple[list[str], list] | None = None,
    right_deltas: Callable[[DataFrame], DataFrame] | None = None,
    empty_right_schema: str | None = None,
):
    """The ``foreachBatch`` callable: one micro-batch = one replay-safe
    IVM increment. ``right_deltas`` maps the batch to the right-side
    delta (default: an empty right delta of ``empty_right_schema`` —
    the fact-stream-vs-accumulating-store shape where the right side
    grows through its own pipeline)."""
    from ..operators.ivm import apply_join_increment, ivm_applied_epochs

    if right_deltas is None and empty_right_schema is None:
        raise ValueError(
            "make_ivm_ingest: provide right_deltas or empty_right_schema "
            "— the increment needs a right-side delta (possibly empty)"
        )

    def ingest(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if int(batch_id) in ivm_applied_epochs(spark, store_path):
            return  # completed epoch redelivered: the store already holds it
        dr = (
            right_deltas(batch_df)
            if right_deltas is not None
            else spark.createDataFrame([], empty_right_schema)
        )
        apply_join_increment(
            spark,
            store_path,
            batch_df,
            dr,
            on=on,
            num_buckets=num_buckets,
            prune_col=prune_col,
            agg=agg,
            epoch=int(batch_id),
        )

    return ingest


def start_ivm_stream(
    spark,
    input_dir: str,
    store_path: str,
    checkpoint_dir: str,
    schema: str,
    on: str | list[str],
    num_buckets: int = 8,
    prune_col: str | None = None,
    agg: tuple[list[str], list] | None = None,
    right_deltas: Callable[[DataFrame], DataFrame] | None = None,
    empty_right_schema: str | None = None,
):
    """File-source streaming view maintenance: parquet batches of left
    (fact) deltas maintain the persisted join view at ``store_path``
    (see :func:`make_ivm_ingest` for the replay contract)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    ingest = make_ivm_ingest(
        spark,
        store_path,
        on=on,
        num_buckets=num_buckets,
        prune_col=prune_col,
        agg=agg,
        right_deltas=right_deltas,
        empty_right_schema=empty_right_schema,
    )
    return (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
