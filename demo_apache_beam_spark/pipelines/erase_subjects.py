"""Subject-erasure CLI — the schedulable execution face of a DSR
(data-subject-request) queue drain (r13):

    python -m demo_apache_beam_spark.pipelines.erase_subjects \\
        --ids /queue/dsr.parquet --id-col user_id \\
        --target events:/lake/events.parquet:user_id \\
        --target customer:/lake/customer.parquet:c_custkey \\
        [--store-catalog /lake/ivm_catalog] \\
        [--sort-col events:ts]

One invocation removes every requested subject from ALL listed source
tables (``operators/layout.py:erase_rows_multi`` — one frozen request
set, broadcast probe + anti-join rewrite per table, zero-match tables
probed but never rewritten) AND, with ``--store-catalog``, from every
materialized IVM store the persisted catalog records over those tables
(``operators/catalog.py`` — the store inventory recorded at build
time, so a view the operator forgot about is reached anyway; the r12
failure mode this composition exists to close). Re-running with the
same queue is an erasure no-op (probes only). Prints ONE JSON line
(the bench.py cron contract) with per-table ``rows_before/erased/
after`` and per-store removed-row counts, so a compliance wrapper can
log exactly what each request touched.

Each ``--target`` is ``name:dataset_path:key_column`` (the column of
that table carrying the SAME subject-id value space as ``--id-col`` in
the queue — the identity-mapped multi-table contract); ``--sort-col
name:col`` preserves a Z-ordered/clustered table's layout through its
rewrite. Scale shape: the request set is DSR-sized (broadcasts); every
rewrite is compaction-shaped — schedule off-peak, batched.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--ids", required=True,
                        help="parquet of subject ids (the DSR queue)")
    parser.add_argument("--id-col", required=True,
                        help="id column in the queue parquet")
    parser.add_argument("--target", action="append", default=[],
                        metavar="NAME:PATH:KEY_COL",
                        help="source table to erase from (repeatable)")
    parser.add_argument("--store-catalog",
                        help="persisted store catalog; every recorded IVM "
                             "store over the targets is erased too")
    parser.add_argument("--sort-col", action="append", default=[],
                        metavar="NAME:COL",
                        help="preserve clustering on a table's rewrite")
    args = parser.parse_args(argv)
    if not args.target:
        parser.error("at least one --target NAME:PATH:KEY_COL is required")

    targets: dict[str, tuple[str, str]] = {}
    for spec in args.target:
        parts = spec.split(":")
        if len(parts) != 3 or not all(parts):
            parser.error(f"--target {spec!r}: expected NAME:PATH:KEY_COL")
        name, path, key_col = parts
        targets[name] = (path, key_col)
    sort_cols: dict[str, str] = {}
    for spec in args.sort_col:
        name, _, col = spec.partition(":")
        if not col:
            parser.error(f"--sort-col {spec!r}: expected NAME:COL")
        if name not in targets:
            parser.error(f"--sort-col {spec!r}: unknown target {name!r}")
        sort_cols[name] = col

    from ..operators.layout import erase_rows_multi
    from ..session import get_spark

    spark = get_spark("erase-subjects")
    result = erase_rows_multi(
        spark,
        spark.read.parquet(args.ids),
        targets=targets,
        id_col=args.id_col,
        sort_cols=sort_cols or None,
        store_catalog=args.store_catalog,
    )
    print(json.dumps({"targets": result}))


if __name__ == "__main__":
    main()
