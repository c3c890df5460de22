"""IVM store maintenance CLI — the schedulable face of the delete/compact
machinery (r12):

    python -m demo_apache_beam_spark.pipelines.maintain_ivm \\
        --store /path/to/ivm_store --on okey[,day] [--buckets 8] \\
        [--compact] \\
        [--delete-queue /path/to/dsr.parquet --key-col uid] \\
        [--agg-group g1,g2 --agg-count n_rows_p --agg-sum col:alias ...]

The two batched table-maintenance operations a production IVM store
schedules (both compaction-shaped full-rewrite jobs — run them off-peak,
like any OPTIMIZE):

- ``--delete-queue``: drain a DSR/CDC tombstone batch — every store row
  whose ``--key-col`` value appears in the queue parquet is removed from
  the bucketed sides, the view, and (as negative monoid partials) the
  maintained aggregate (``operators/ivm.py:apply_delete_increment``; the
  agg spec is REQUIRED when the store maintains an aggregate — the
  operator refuses a spec-less delete rather than leave the aggregate
  silently stale). The queue is consumed idempotently in the erasure
  sense: re-running with the same queue removes nothing further.
- ``--compact``: rewrite each bucketed side back to one file per bucket
  (``compact_ivm_sides``) — removes the per-refresh stored-side Sort
  multi-file buckets force — and rewrite the streaming replay ledger
  (``{store}/applied``, when present) back to one file
  (``compact_ivm_ledger``, r13): every streamed increment appends one
  tiny parquet file there and the ledger is re-read on the hot path of
  every micro-batch, so a months-long stream otherwise pays a
  thousands-of-files listing per skip check.

The aggregate spec mirrors the monoid partials every registry store
uses: ``--agg-count ALIAS`` adds ``count(*) AS ALIAS``; each
``--agg-sum col:alias`` adds an exact ``sum(cast(col AS
decimal(18,6))) AS alias``. Prints ONE JSON line (the bench.py
contract) with per-dataset removed-row counts and post-compaction file
counts, so a cron wrapper can log/alert.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--store", required=True, help="IVM store path")
    parser.add_argument("--on", required=True,
                        help="join key columns, comma-separated")
    parser.add_argument("--buckets", type=int, default=8)
    parser.add_argument("--compact", action="store_true",
                        help="compact the bucketed sides")
    parser.add_argument("--delete-queue",
                        help="parquet of delete keys (DSR/CDC tombstones)")
    parser.add_argument("--key-col",
                        help="column identifying rows to delete "
                             "(required with --delete-queue)")
    parser.add_argument("--agg-group",
                        help="aggregate-view group columns, comma-separated")
    parser.add_argument("--agg-count",
                        help="alias of the count(*) partial column")
    parser.add_argument("--agg-sum", action="append", default=[],
                        metavar="COL:ALIAS",
                        help="exact decimal(18,6) sum partial (repeatable)")
    args = parser.parse_args(argv)
    if args.delete_queue and not args.key_col:
        parser.error("--delete-queue requires --key-col")
    if not args.delete_queue and not args.compact:
        parser.error("nothing to do: pass --delete-queue and/or --compact")

    from ..operators.ivm import (
        apply_delete_increment,
        compact_ivm_ledger,
        compact_ivm_sides,
    )
    from ..session import get_spark

    spark = get_spark("maintain-ivm")
    on = [c.strip() for c in args.on.split(",") if c.strip()]
    result: dict = {"store": args.store}

    if args.delete_queue:
        # the serialized agg vocabulary is shared with the store
        # catalog (operators/catalog.py:build_agg_spec) — one format
        # for flags and persisted inventory alike
        from ..operators.catalog import build_agg_spec

        try:
            agg = build_agg_spec(
                args.agg_group, args.agg_count, ",".join(args.agg_sum)
            )
        except ValueError as e:
            parser.error(str(e))
        keys = spark.read.parquet(args.delete_queue)
        result["deleted"] = apply_delete_increment(
            spark,
            args.store,
            keys,
            args.key_col,
            on=on,
            num_buckets=args.buckets,
            agg=agg,
        )
    if args.compact:
        result["compacted_files"] = compact_ivm_sides(
            spark, args.store, on, args.buckets
        )
        result["ledger_rows"] = compact_ivm_ledger(spark, args.store)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
