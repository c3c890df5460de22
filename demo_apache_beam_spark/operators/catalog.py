"""Persisted store catalog — (source table → dependent materialized
stores), recorded at store-build time, so right-to-erasure can discover
every copy of a subject instead of trusting a hand-maintained dict.

The r12 erasure story closed the VIEW hole (``erase_from_ivm_store``
removes a subject from a store's sides/view/aggregate) but reopened it
one level up (VERDICT r12 item 2): ``erase_rows_multi(ivm_stores=)``
takes a caller-supplied dict, and a FORGOTTEN store silently keeps the
subject — the exact failure mode the view fix closed, reintroduced at
the inventory level. This module makes the inventory a persisted
artifact:

- :func:`record_store_dependency` upserts one catalog row per
  (store, source table) when a store is (re)built — the only moment
  the builder provably knows the store's sources, key column, and
  layout params;
- :func:`ivm_stores_from_catalog` turns the rows covering a set of
  target tables into the exact ``ivm_stores`` dict
  ``erase_rows_multi`` consumes — erasure becomes complete BY
  CONSTRUCTION over everything the catalog knows;
- the view-aware erasure audit enumerates the same rows, so the audit
  surface and the execute surface cannot drift apart.

One catalog covers ONE subject-id space (the audit's user_id ==
c_custkey == o_custkey identity mapping): ``key_col`` names the store
column carrying that id, and the discovery hands every store the SAME
frozen request-id set. A second id space (e.g. order-key erasure) is a
second catalog. The aggregate spec is stored in the serialized form of
``pipelines/maintain_ivm.py`` (group csv + count alias + ``col:alias``
sum list) — plain strings, so the catalog is a plain parquet dataset
any engine can read; :func:`build_agg_spec` reconstitutes the Column
partials.

Scale shape: the catalog is inventory metadata — one row per
(store, source table), driver-bounded by construction (a warehouse
has hundreds of views, not billions). Every write rewrites the whole
(tiny) dataset through a collect + overwrite; every read collects it.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

_CATALOG_SCHEMA = (
    "store_name string, kind string, store_path string, "
    "source_table string, key_col string, on_cols string, "
    "num_buckets int, agg_group string, agg_count string, "
    "agg_sums string, params string"
)

_FIELDS = [f.split()[0] for f in _CATALOG_SCHEMA.split(", ")]

#: Catalog kinds with an id-driven discovery path. ``ivm`` stores erase
#: by probing the subject id against a recorded store column
#: (:func:`ivm_stores_from_catalog`); ``dedup_exact``/``dedup_minhash``
#: stores erase by the subject's DOCUMENT CONTENT, so discovery
#: captures the subject's doc rows from the source table BEFORE its
#: rewrite (:func:`dedup_stores_from_catalog` + ``erase_rows_multi``).
#: Hamming (perceptual media) stores are deliberately NOT
#: catalog-discoverable: their erase keys are signatures recomputed
#: from decoded payloads (modality-dependent) — erase them through
#: ``operators/dedup.py:erase_from_hamming_store`` explicitly.
KINDS = ("ivm", "dedup_exact", "dedup_minhash")


def build_agg_spec(
    agg_group: str | None,
    agg_count: str | None,
    agg_sums: str | None,
):
    """Reconstitute an ``agg=(group_cols, partial_aggs)`` spec from its
    serialized catalog/CLI form: ``agg_group`` is the group-column csv,
    ``agg_count`` the alias of a ``count(*)`` partial, ``agg_sums`` a
    csv of ``col:alias`` exact ``decimal(18,6)`` sum partials — the
    identical monoid vocabulary ``pipelines/maintain_ivm.py`` exposes
    as flags. Returns ``None`` when no group is set."""
    if not agg_group:
        return None
    partials = []
    if agg_count:
        partials.append(F.count(F.lit(1)).alias(agg_count))
    for spec in (agg_sums or "").split(","):
        spec = spec.strip()
        if not spec:
            continue
        col, _, alias = spec.partition(":")
        if not alias:
            raise ValueError(
                f"build_agg_spec: agg_sums entry {spec!r}: expected COL:ALIAS"
            )
        partials.append(F.sum(F.col(col).cast("decimal(18,6)")).alias(alias))
    if not partials:
        raise ValueError(
            "build_agg_spec: agg_group given but no count/sum partials"
        )
    return ([c.strip() for c in agg_group.split(",") if c.strip()], partials)


def record_store_dependency(
    spark,
    catalog_path: str,
    store_name: str,
    store_path: str,
    source_tables: list[str],
    key_col: str,
    on: str | list[str],
    num_buckets: int = 8,
    agg_group: str | None = None,
    agg_count: str | None = None,
    agg_sums: str | None = None,
    kind: str = "ivm",
    params: dict | None = None,
) -> int:
    """Upsert the catalog rows for one store: any prior rows under
    ``store_name`` are replaced by one row per source table — a store
    REBUILD re-records idempotently, and a store whose source list or
    layout changed overwrites its stale inventory instead of
    accreting. The rewrite collects the (tiny) prior rows first, so it
    never reads the files it is overwriting (and self-migrates a
    catalog written under an older schema). Returns the catalog's
    post-upsert row count.

    ``kind`` must be one of :data:`KINDS`. For the dedup kinds,
    ``params`` records the store's BUILD parameters as a JSON dict —
    ``dedup_exact``: ``{"key_cols": [...], "id_col": ...}``;
    ``dedup_minhash``: ``{"id_col", "text_col", "num_hashes",
    "bands", "shingle_n"}`` — and ``key_col`` still names the SOURCE
    table's subject column (how the subject's doc rows are found);
    ``on``/``num_buckets`` are unused there (pass ``on=""``)."""
    import json

    if kind not in KINDS:
        raise ValueError(
            f"record_store_dependency: unknown kind {kind!r} — one of "
            f"{KINDS} (hamming stores erase through their explicit "
            "wrapper; see KINDS)"
        )
    rows = [
        r
        for r in catalog_entries(spark, catalog_path)
        if r["store_name"] != store_name
    ]
    on_csv = on if isinstance(on, str) else ",".join(on)
    for src in source_tables:
        rows.append(
            {
                "store_name": store_name,
                "kind": kind,
                "store_path": os.path.abspath(store_path)
                if "://" not in store_path
                else store_path,
                "source_table": src,
                "key_col": key_col,
                "on_cols": on_csv,
                "num_buckets": int(num_buckets),
                "agg_group": agg_group,
                "agg_count": agg_count,
                "agg_sums": agg_sums,
                "params": json.dumps(params, sort_keys=True)
                if params is not None
                else None,
            }
        )
    spark.createDataFrame(
        [tuple(r[f] for f in _FIELDS) for r in rows], _CATALOG_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(catalog_path)
    spark.catalog.refreshByPath(catalog_path)
    return len(rows)


def catalog_entries(spark, catalog_path: str) -> list[dict]:
    """All catalog rows as dicts, sorted (store_name, source_table) for
    deterministic consumers (the audit's row order, the erasure's store
    order). Driver-bounded: one row per (store, source table)."""
    from .dedup import _hadoop_path_exists

    if not _hadoop_path_exists(spark, catalog_path):
        return []
    return sorted(
        (
            # .get: tolerant of rows written under an older schema (a
            # later upsert rewrites them under the current one)
            {f: r.asDict().get(f) for f in _FIELDS}
            for r in spark.read.parquet(catalog_path).collect()
        ),
        key=lambda r: (r["store_name"], r["source_table"]),
    )


def dedup_stores_from_catalog(
    spark,
    catalog_path: str,
    tables: list[str] | None = None,
) -> list[dict]:
    """The catalog's ``dedup_exact``/``dedup_minhash`` entries covering
    any of ``tables`` (``None`` = all), deduplicated by store name —
    each as ``{store_name, kind, store_path, source_table, key_col,
    params}`` with ``params`` already JSON-decoded. These erase by the
    subject's DOCUMENT CONTENT, so ``erase_rows_multi`` captures the
    subject's doc rows from ``source_table`` (probing ``key_col``)
    BEFORE that table's rewrite, then drives the kind's erase wrapper
    with the recorded build params."""
    import json

    out: dict[str, dict] = {}
    for r in catalog_entries(spark, catalog_path):
        if r["kind"] not in ("dedup_exact", "dedup_minhash"):
            continue
        if tables is not None and r["source_table"] not in tables:
            continue
        if r["store_name"] in out:
            continue
        out[r["store_name"]] = {
            "store_name": r["store_name"],
            "kind": r["kind"],
            "store_path": r["store_path"],
            "source_table": r["source_table"],
            "key_col": r["key_col"],
            "params": json.loads(r["params"]) if r["params"] else {},
        }
    return [out[k] for k in sorted(out)]


def ivm_stores_from_catalog(
    spark,
    catalog_path: str,
    tables: list[str] | None = None,
) -> dict[str, dict]:
    """The ``ivm_stores`` dict ``erase_rows_multi`` consumes, discovered
    from the catalog: every ``kind='ivm'`` store depending on any of
    ``tables`` (``None`` = every recorded store), deduplicated by store
    name (a store over several target tables erases ONCE — its rows
    share path/key/layout by the upsert contract). The caller's frozen
    request-id set is probed against each store's recorded ``key_col``.
    """
    out: dict[str, dict] = {}
    for r in catalog_entries(spark, catalog_path):
        if r["kind"] != "ivm":
            continue
        if tables is not None and r["source_table"] not in tables:
            continue
        if r["store_name"] in out:
            continue
        out[r["store_name"]] = {
            "store_path": r["store_path"],
            "key_col": r["key_col"],
            "on": [c for c in r["on_cols"].split(",") if c],
            "num_buckets": int(r["num_buckets"]),
            "agg": build_agg_spec(
                r["agg_group"], r["agg_count"], r["agg_sums"]
            ),
        }
    return out
