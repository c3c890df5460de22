"""Incremental view maintenance — delta-join algebra over a persisted
materialized join view.

The batch-refresh face of materialized views: a warehouse keeps
``A ⋈ B`` materialized, facts arrive as APPEND-ONLY deltas, and each
refresh must pay for the deltas, not the recompute. The classic
identity (inner equi-join, append-only inputs):

    (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A⋈B  ∪  ΔA⋈(B ∪ ΔB)  ∪  A⋈ΔB

so the VIEW DELTA is ``ΔA⋈B_new ∪ A_old⋈ΔB`` — two joins whose left
sides are delta-sized (the ΔA⋈ΔB cross term folds into the first). At
100 TB each refresh is one delta-vs-stored join per side; store both
sides bucketed on the key (``functions/sinks.py:write_bucketed``) and
the joins are exchange-free on the stored side. This complements —
not duplicates — the stream-stream joins in ``streaming/joins.py``:
those hold bounded watermark state in the engine; this maintains an
UNBOUNDED persisted view across batch refreshes, the nightly-delta
contract.

Append-only is the contract (facts append; updates/deletes belong to
the CDC compaction and erasure machinery): re-appending an existing
key is two distinct fact rows, exactly like re-inserting into a fact
table. The store holds three datasets — ``left/``, ``right/``,
``view/`` — appended per increment; the returned view delta is
localCheckpointed BEFORE the store mutates (the freeze discipline every
incremental operator here follows), so the lazy reads cannot re-list
their own writes. Increments run serially (the standard ingest-
scheduler contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers' convenience)

from .dedup import _hadoop_path_exists


def apply_join_increment(
    spark,
    store_path: str,
    delta_left: DataFrame,
    delta_right: DataFrame,
    on: str | list[str],
) -> DataFrame:
    """Apply one append-only increment ``(ΔA, ΔB)`` to the materialized
    inner equi-join view at ``store_path``; returns the VIEW DELTA
    (the new join rows), already localCheckpointed.

    Both sides' non-key column names must be disjoint (raises up
    front — a silent duplicate column would poison the stored view).
    """
    from .checkpoints import tracked_local_checkpoint

    keys = [on] if isinstance(on, str) else list(on)
    l_extra = set(delta_left.columns) - set(keys)
    r_extra = set(delta_right.columns) - set(keys)
    clash = l_extra & r_extra
    if clash:
        raise ValueError(
            f"apply_join_increment: non-key columns shared by both sides "
            f"{sorted(clash)} — rename before materializing"
        )

    l_path, r_path, v_path = (
        f"{store_path}/left",
        f"{store_path}/right",
        f"{store_path}/view",
    )
    l_old = (
        spark.read.parquet(l_path)
        if _hadoop_path_exists(spark, l_path)
        else None
    )
    r_old = (
        spark.read.parquet(r_path)
        if _hadoop_path_exists(spark, r_path)
        else None
    )
    r_new = (
        delta_right if r_old is None else r_old.unionByName(delta_right)
    )
    dview = delta_left.join(r_new, keys)
    if l_old is not None:
        dview = dview.unionByName(l_old.join(delta_right, keys))
    dview = tracked_local_checkpoint(dview)

    delta_left.write.mode("append").parquet(l_path)
    delta_right.write.mode("append").parquet(r_path)
    dview.write.mode("append").parquet(v_path)
    return dview


def read_join_view(spark, store_path: str) -> DataFrame:
    """The accumulated materialized view (all increments applied)."""
    return spark.read.parquet(f"{store_path}/view")
