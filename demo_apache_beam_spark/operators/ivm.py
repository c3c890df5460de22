"""Incremental view maintenance — delta-join algebra over a persisted
materialized join view, with the stored sides BUCKETED on the join key
and the rollup maintained as an incremental monoid aggregate.

The batch-refresh face of materialized views: a warehouse keeps
``A ⋈ B`` materialized, facts arrive as APPEND-ONLY deltas, and each
refresh must pay for the deltas, not the recompute. The classic
identity (inner equi-join, append-only inputs):

    (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A⋈B  ∪  ΔA⋈B_old  ∪  ΔA⋈ΔB  ∪  A_old⋈ΔB

so the VIEW DELTA is the three right-hand terms. The decomposition is
deliberately kept in that 3-term form (rather than folding ΔA⋈ΔB into
``ΔA⋈(B_old ∪ ΔB)``): each STORED side then appears only as a direct
scan of its bucketed table — never under a union — so the scan's
bucket layout satisfies the join's required distribution and Catalyst
plans the stored side with ZERO Exchange (pinned by
``tests/test_joins.py::test_ivm_refresh_join_stored_side_no_exchange``).
At 100 TB this is the whole point of the algebra: the accumulated
(unbounded) sides never reshuffle on refresh; only the delta side pays
one delta-sized Exchange per term. The sides are written through
bucketed catalog tables (the ``functions/sinks.py:write_bucketed``
contract); appends land new per-bucket files, which Spark groups back
into the same bucket partitioning at scan (ordering is re-sorted but
no Exchange — many-increment stores compact through
:func:`compact_ivm_sides`; the generic ``layout.py:compact_files``
must NOT touch these directories, see its docstring). This complements
— not
duplicates — the stream-stream joins in ``streaming/joins.py``: those
hold bounded watermark state in the engine; this maintains an
UNBOUNDED persisted view across batch refreshes, the nightly-delta
contract.

The AGGREGATE view (:func:`apply_aggregate_increment` /
:func:`read_aggregate_view`) completes the story: each increment
appends a dimension-sized partial (count / exact-decimal sum — monoid
partials) computed from the view delta, and the registry read merges
partials with one dimension-sized aggregation — the rollup query never
scans the accumulated view at all.

Append-only is the contract (facts append; updates/deletes belong to
the CDC compaction and erasure machinery): re-appending an existing
key is two distinct fact rows, exactly like re-inserting into a fact
table. The store holds four datasets — ``left/``, ``right/`` (bucketed
tables), ``view/``, ``agg/`` (plain parquet appends). Both input
deltas are localCheckpointed UP FRONT (ADVICE r10) so the returned
view delta and the store appends derive from the same frozen rows even
for non-deterministic upstream plans; the view delta is additionally
checkpointed BEFORE the store mutates, so the caller's lazy reads
cannot re-list the post-append store. Increments run serially (the
standard ingest-scheduler contract).
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers' convenience)

from .dedup import _hadoop_path_exists


def _side_table_name(store_path: str, sub: str) -> str:
    """Deterministic catalog name for a bucketed side of the store at
    ``store_path`` — derived from the absolute path (local) or the URI
    as given (remote) so two stores never collide and the same store
    re-attaches to the same name. ``os.path.abspath`` on an
    ``hdfs://``/``s3a://`` URI would treat it as cwd-relative and make
    the digest — and hence the catalog name — depend on the driver's
    working directory (review r11)."""
    joined = store_path.rstrip("/") + "/" + sub
    key = joined if "://" in store_path else os.path.abspath(joined)
    digest = hashlib.md5(key.encode()).hexdigest()[:12]
    return f"ivm_{sub}_{digest}"


def _attach_side(
    spark, store_path: str, sub: str, keys: list[str], num_buckets: int
):
    """Bucket-aware handle on one stored side: returns
    ``(table_name, old_df_or_None)``. A catalog entry whose files were
    deleted out-of-band is dropped (stale); an existing store is
    re-attached through ``register_bucketed_table`` (spec-validated,
    metadata-only) so the scan keeps its bucket layout — a plain
    ``spark.read.parquet`` would lose it and reintroduce the Exchange.
    """
    from ..functions.sinks import register_bucketed_table

    path = os.path.join(store_path, sub)
    tbl = _side_table_name(store_path, sub)
    exists = _hadoop_path_exists(spark, path)
    if spark.catalog.tableExists(tbl) and not exists:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    if not exists:
        return tbl, None
    df = register_bucketed_table(
        spark, tbl, path, keys, num_buckets, sort_cols=keys
    )
    # appends may have landed since the catalog cached the listing
    spark.catalog.refreshTable(tbl)
    return tbl, df


def _append_side(
    delta: DataFrame, tbl: str, path: str, keys: list[str], num_buckets: int
) -> None:
    """Append one delta into a bucketed side table (creates it on the
    first increment). Spark validates the bucket spec on append, so a
    drifted table fails loud instead of mixing layouts. The ``path``
    option is passed only at creation — an existing table already owns
    its location and some Spark versions reject a redundant path."""
    writer = (
        delta.write.mode("append")
        .format("parquet")
        .bucketBy(int(num_buckets), *keys)
        .sortBy(*keys)
    )
    if not delta.sparkSession.catalog.tableExists(tbl):
        writer = writer.option("path", path)
    writer.saveAsTable(tbl)


def _prune_bounds(delta: DataFrame, prune_col: str):
    """(min, max) of the frozen delta's prune column — one bounded
    driver row; (None, None) for an empty delta."""
    row = delta.agg(
        F.min(prune_col).alias("_lo"), F.max(prune_col).alias("_hi")
    ).collect()[0]
    return row["_lo"], row["_hi"]


def _pruned(stored, delta: DataFrame, prune_col: str | None):
    """The stored side restricted to the delta's prune-column range —
    EXACT because ``prune_col`` is one of the join keys: a stored row
    outside the delta's [min, max] cannot equal any delta row on it.
    The BETWEEN lands in the scan's PushedFilters, and because
    increments append time-correlated files, parquet footer min/max
    stats skip every old increment's files wholesale — the read-term
    lever the r11 refresh probe identified (SURVEY §6): the refresh
    scan becomes delta-CORRELATED instead of O(|stored|), with no
    partitionBy machinery. An empty delta prunes the whole side (its
    join term is empty anyway)."""
    if stored is None or prune_col is None:
        return stored
    lo, hi = _prune_bounds(delta, prune_col)
    if lo is None:
        return stored.filter(F.lit(False))
    return stored.filter(F.col(prune_col).between(F.lit(lo), F.lit(hi)))


def _view_delta(
    l_old,
    r_old,
    delta_left: DataFrame,
    delta_right: DataFrame,
    keys,
    prune_col: str | None = None,
) -> DataFrame:
    """The 3-term view delta ``ΔA⋈B_old ∪ ΔA⋈ΔB ∪ A_old⋈ΔB`` with every
    stored side a direct bucketed-table scan (module docstring), each
    pruned to the opposing delta's ``prune_col`` range when set."""
    terms = []
    if r_old is not None:
        terms.append(delta_left.join(_pruned(r_old, delta_left, prune_col), keys))
    terms.append(delta_left.join(delta_right, keys))
    if l_old is not None:
        terms.append(_pruned(l_old, delta_right, prune_col).join(delta_right, keys))
    out = terms[0]
    for t in terms[1:]:
        out = out.unionByName(t)
    return out


def apply_join_increment(
    spark,
    store_path: str,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: str | list[str],
    num_buckets: int = 8,
    prune_col: str | None = None,
    _frozen: bool = False,
) -> DataFrame:
    """Apply one append-only increment ``(ΔA, ΔB)`` to the materialized
    inner equi-join view at ``store_path``; returns the VIEW DELTA
    (the new join rows), already localCheckpointed (the caller owns that
    pin; the internal delta freezes are released before returning).

    Both sides' non-key column names must be disjoint (raises up
    front — a silent duplicate column would poison the stored view).
    ``num_buckets`` must stay constant across a store's lifetime (the
    bucketed append validates it; size it to the target scale — the
    test default 8 stands in for the thousands a 100 TB side needs).

    ``prune_col`` (optional; must be one of the join keys) turns the
    stored-side READ delta-correlated: each stored side is filtered to
    the opposing delta's [min, max] on that column — exact, since
    matching rows agree on every join key — and the BETWEEN reaches the
    parquet scan as a pushed filter, so the footer min/max of every
    OLD increment's time-correlated files skips them wholesale. This is
    the read-term lever the r11 refresh probe identified (SURVEY §6):
    without it a refresh scans both accumulated sides in full; with a
    time-like join component (event day, ingest epoch) the scan cost
    tracks the delta instead. Plan-pinned in
    ``tests/test_joins.py::test_ivm_prune_col_pushes_stored_side_filter``.
    ``_frozen`` is the internal contract with
    :func:`apply_left_join_increment`: the deltas are already
    localCheckpointed, so re-freezing (a second full materialization of
    every delta — review r11) is skipped.
    """
    from .checkpoints import (
        track_checkpoints,
        tracked_local_checkpoint,
        unpersist_ids,
    )

    keys = [on] if isinstance(on, str) else list(on)
    l_extra = set(delta_left.columns) - set(keys)
    r_extra = set(delta_right.columns) - set(keys)
    clash = l_extra & r_extra
    if clash:
        raise ValueError(
            f"apply_join_increment: non-key columns shared by both sides "
            f"{sorted(clash)} — rename before materializing"
        )
    if prune_col is not None and prune_col not in keys:
        raise ValueError(
            f"apply_join_increment: prune_col {prune_col!r} must be "
            "one of the join keys — pruning on a non-key column "
            "would silently drop matching rows"
        )

    # freeze BOTH deltas first (ADVICE r10): the view delta below and
    # the side-store appends must derive from the same rows — a
    # non-deterministic upstream plan executed twice would let the
    # stored sides diverge from the already-returned view delta. The
    # freezes are scoped to this increment (ledger + unpersist in
    # finally): a long-lived nightly-refresh session must not pin two
    # delta copies per increment forever (review r11). The ledger is
    # closed before the view-delta checkpoint, so THAT pin — the return
    # value — stays alive for the caller.
    _delta_ids: list = []
    if not _frozen:
        with track_checkpoints() as _delta_ids:
            delta_left = tracked_local_checkpoint(delta_left)
            delta_right = tracked_local_checkpoint(delta_right)

    try:
        l_path, r_path, v_path = (
            os.path.join(store_path, "left"),
            os.path.join(store_path, "right"),
            os.path.join(store_path, "view"),
        )
        l_tbl, l_old = _attach_side(
            spark, store_path, "left", keys, num_buckets
        )
        r_tbl, r_old = _attach_side(
            spark, store_path, "right", keys, num_buckets
        )

        dview = tracked_local_checkpoint(
            _view_delta(
                l_old, r_old, delta_left, delta_right, keys,
                prune_col=prune_col,
            )
        )

        _append_side(delta_left, l_tbl, l_path, keys, num_buckets)
        _append_side(delta_right, r_tbl, r_path, keys, num_buckets)
        dview.write.mode("append").parquet(v_path)
        for t in (l_tbl, r_tbl):
            spark.catalog.refreshTable(t)
        return dview
    finally:
        unpersist_ids(spark, _delta_ids)


def read_join_view(spark, store_path: str) -> DataFrame:
    """The accumulated materialized view (all increments applied)."""
    return spark.read.parquet(os.path.join(store_path, "view"))


def apply_aggregate_increment(
    spark,
    store_path: str,
    view_delta: DataFrame,
    group_cols: list[str],
    partial_aggs: list,
) -> None:
    """Maintain the AGGREGATE view incrementally: append one
    dimension-sized partial computed from this increment's view delta.

    ``partial_aggs`` are aliased aggregate Columns that must be
    SUM-MERGEABLE monoids — ``F.count(...)`` partials merge by sum,
    exact-decimal ``F.sum(cast)`` partials merge by decimal sum (both
    order-independent); an average is expressed as sum+count partials
    and divided at read. Each append is |groups| rows, so after N
    increments the stored aggregate is N·|groups| rows — the
    :func:`read_aggregate_view` merge is dimension-sized, never a scan
    of the accumulated view.
    """
    (
        view_delta.groupBy(*group_cols)
        .agg(*partial_aggs)
        .write.mode("append")
        .parquet(os.path.join(store_path, "agg"))
    )


def read_aggregate_view(
    spark, store_path: str, group_cols: list[str], merge_aggs: list
) -> DataFrame:
    """Merge the appended monoid partials into the current aggregate —
    one groupBy over N·|groups| rows (``merge_aggs``: aliased Columns
    summing the partial columns)."""
    return (
        spark.read.parquet(os.path.join(store_path, "agg"))
        .groupBy(*group_cols)
        .agg(*merge_aggs)
    )


def compact_ivm_sides(
    spark, store_path: str, keys: list[str], num_buckets: int
) -> dict:
    """Compact the bucketed side tables back to ONE file per bucket.

    Every increment appends new per-bucket files; Spark groups them
    back into the right partitions at scan, but after many increments
    the small-files overhead dominates. Generic
    ``operators/layout.py:compact_files`` MUST NOT touch these
    directories — it rewrites through a plain parquet writer, which
    destroys the bucket-id file naming while the catalog DDL still
    claims bucketed, i.e. silently WRONG exchange-free joins. This
    helper rewrites each side THROUGH the bucketed writer instead, with
    the erase_rows write-then-swap discipline — the accumulated side is
    the unbounded dataset this module exists to preserve, so at no
    point is it held only in memory (a delete-before-write draft kept
    the rows solely in a non-replicated localCheckpoint — an executor
    loss in that window would have destroyed the store; review r11):

    1. write the compacted copy to a ``__compacting`` sibling through a
       temp bucketed table, reading the side as PLAIN parquet with a
       ``repartition(num_buckets, keys)`` in the write plan — Spark's
       repartition hash is the same Murmur3 the bucketizer uses, so
       partition index == bucket id → exactly one file per bucket. The
       plain read matters: on the bucketed-table scan the planner
       elides the repartition as already-satisfied and THEN disables
       the bucketed scan (no operator needs it anymore), leaving
       mixed-bucket tasks — "Bucketed: false (disabled by query
       planner)" with no Exchange, one file per (task, bucket)
       (measured, review r11);
    2. rename original → ``__precompact``, rename the copy into place
       (a durable copy exists at every step; a crash between the
       renames leaves the original recoverable under ``__precompact``);
    3. drop the temp catalog entry, refresh the real one (its location
       never changed), delete the backup.

    Stale ``__compacting``/``__precompact`` leftovers from a crashed
    run are cleared up front. Cost is one full rewrite of each side —
    that's what compaction is; schedule it like any other table
    maintenance. Beyond small-files overhead, multi-file buckets also
    force a stored-side Sort into every refresh join (sorted-scan
    metadata needs one file per bucket) — measured 14.8 s to compact a
    2×10M-row store (SURVEY §6). Returns per-side file counts after
    compaction."""
    out = {}
    jvm = spark._jvm
    for sub in ("left", "right"):
        tbl, df = _attach_side(spark, store_path, sub, keys, num_buckets)
        if df is None:
            continue
        path = os.path.join(store_path, sub)
        # plain read — the bucketed-table scan would defeat the
        # repartition (docstring step 1); the original files stay alive
        # until the swap, so no freeze is needed either
        df = spark.read.parquet(path)
        tmp_path = path + "__compacting"
        bak_path = path + "__precompact"
        tmp_tbl = f"{tbl}_compacting"
        fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        # clear leftovers of a crashed prior run
        spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
        for stale in (tmp_path, bak_path):
            sp = jvm.org.apache.hadoop.fs.Path(stale)
            if fs.exists(sp):
                fs.delete(sp, True)

        (
            df.repartition(int(num_buckets), *[F.col(k) for k in keys])
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(int(num_buckets), *keys)
            .sortBy(*keys)
            .option("path", tmp_path)
            .saveAsTable(tmp_tbl)
        )
        p_orig = jvm.org.apache.hadoop.fs.Path(path)
        p_tmp = jvm.org.apache.hadoop.fs.Path(tmp_path)
        p_bak = jvm.org.apache.hadoop.fs.Path(bak_path)
        if not fs.rename(p_orig, p_bak):
            raise OSError(f"compact_ivm_sides: rename {path} -> {bak_path} failed")
        if not fs.rename(p_tmp, p_orig):
            # put the original back — the compacted copy is still durable
            fs.rename(p_bak, p_orig)
            raise OSError(f"compact_ivm_sides: rename {tmp_path} -> {path} failed")
        spark.sql(f"DROP TABLE IF EXISTS {tmp_tbl}")
        spark.catalog.refreshTable(tbl)
        fs.delete(p_bak, True)
        out[sub] = sum(
            1
            for st in fs.listStatus(p_orig)
            if st.getPath().getName().endswith(".parquet")
        )
    return out


def apply_left_join_increment(
    spark,
    store_path: str,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: str | list[str],
    num_buckets: int = 8,
    prune_col: str | None = None,
) -> None:
    """LEFT OUTER join view maintenance (the retraction-bearing half the
    inner algebra cannot express): maintain ``A LEFT JOIN B`` under
    append-only deltas. The inner-match rows are append-only and reuse
    the whole :func:`apply_join_increment` machinery (bucketed sides,
    frozen deltas) at ``{store}/inner``; the NULL-extended rows are the
    left rows with no match yet — and that set shrinks when ΔB arrives,
    which is a RETRACTION, so it lives in its own rewritten dataset:

        unmatched_new = unmatched_old ⟕̸ ΔB  ∪  ΔA ⟕̸ B_new

    (anti-joins: unmatched_old rows already failed to match B_old, so
    only ΔB can claim them; ΔA must clear all of B_new). The rows any
    increment moves out of ``unmatched`` are exactly the
    ``A_old ⋈ ΔB`` term the inner store just appended — the two
    datasets stay consistent by construction (pinned per-increment in
    pytest against a full recompute).

    Scale shape: the anti-joins are delta-vs-stored (the stored side of
    ``ΔA ⟕̸ B_new`` is the bucketed right table — exchange-free like
    every stored-side join here), except the ``unmatched`` rewrite,
    which costs |unmatched| per refresh — bounded by the fact table's
    UNMATCHED rows (telemetry without a dimension row yet), a set that
    drains as late dimension rows arrive; a warehouse where it grows
    unboundedly has a referential-integrity problem, not a plan
    problem. Read with :func:`read_left_join_view`.
    """
    from .checkpoints import (
        track_checkpoints,
        tracked_local_checkpoint,
        unpersist_ids,
    )

    keys = [on] if isinstance(on, str) else list(on)
    # one ledger spans the whole increment: the delta freezes, the inner
    # store's view-delta checkpoint (its return value is not used here),
    # and the unmatched-rewrite freeze are all released on exit — none
    # of these pins outlives the increment (review r11)
    with track_checkpoints() as _ckpt:
        try:
            delta_left = tracked_local_checkpoint(delta_left)
            delta_right = tracked_local_checkpoint(delta_right)

            inner = os.path.join(store_path, "inner")
            apply_join_increment(
                spark, inner, delta_left, delta_right, on=keys,
                num_buckets=num_buckets, prune_col=prune_col,
                _frozen=True,
            )
            _, r_all = _attach_side(spark, inner, "right", keys, num_buckets)
            # the anti-probe prunes too: B_new rows outside ΔA's
            # prune-column range cannot match any ΔA row, so removing
            # them cannot flip an anti-join verdict
            r_all = _pruned(r_all, delta_left, prune_col)
            um_path = os.path.join(store_path, "unmatched")
            if _hadoop_path_exists(spark, um_path):
                um_old = spark.read.parquet(um_path).join(
                    delta_right.select(*keys), keys, "left_anti"
                )
            else:
                um_old = None
            um_new = delta_left.join(r_all.select(*keys), keys, "left_anti")
            um = um_old.unionByName(um_new) if um_old is not None else um_new
            # the rewrite plan reads the old store — freeze before
            # overwriting
            um = tracked_local_checkpoint(um)
            um.write.mode("overwrite").parquet(um_path)
            spark.catalog.refreshByPath(um_path)
        finally:
            unpersist_ids(spark, _ckpt)


def read_left_join_view(spark, store_path: str) -> DataFrame:
    """The accumulated LEFT OUTER view: inner-match rows ∪ unmatched
    left rows null-extended to the right side's columns (taken from the
    stored right table's own schema, so the extension never drifts from
    what was written)."""
    inner = spark.read.parquet(os.path.join(store_path, "inner", "view"))
    um = spark.read.parquet(os.path.join(store_path, "unmatched"))
    right_schema = spark.read.parquet(
        os.path.join(store_path, "inner", "right")
    ).schema
    ext = um
    for f in right_schema.fields:
        if f.name not in um.columns:
            ext = ext.withColumn(f.name, F.lit(None).cast(f.dataType))
    return inner.unionByName(ext.select(*inner.columns))
