"""Scoped ``localCheckpoint`` tracking for long-running drivers.

``DataFrame.localCheckpoint`` pins its materialized RDD in the
session-global persistent-RDD map until explicitly unpersisted, so a
long-running ``foreachBatch`` stream must free the blocks each batch
creates or accumulate them without bound. The obvious cleanup — diff
the GLOBAL map before/after the batch and unpersist every new id — is
wrong under concurrency: any OTHER job sharing the SparkSession (a
second stream, a parallel batch query) that caches or checkpoints
during the window gets its RDD unpersisted too, and because
``localCheckpoint`` truncates lineage, that RDD is unrecoverable — the
other job dies with missing-checkpoint-block errors (ADVICE r6).

This module scopes the cleanup to exactly the checkpoints the current
code path takes: :func:`tracked_local_checkpoint` records the concrete
JVM RDD id behind each checkpoint it performs into a **thread-local**
ledger opened by :func:`track_checkpoints`. ``foreachBatch`` runs the
ingest body on a single thread, so the ledger captures every
checkpoint the batch creates — including intermediates inside called
operators (connected-components rounds, band materialization) —
and nothing any concurrent thread creates. Outside an open ledger the
helper is byte-for-byte ``df.localCheckpoint()``.

The RDD id is read off the checkpointed DataFrame's logical plan
(``LogicalRDD.rdd``), which is the exact RDD ``localCheckpoint``
registered in the persistent map — no global diffing anywhere.
"""

from __future__ import annotations

import threading
from collections.abc import Iterator
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession

_LEDGER = threading.local()


@contextmanager
def track_checkpoints() -> Iterator[list[int]]:
    """Open a thread-local ledger; every
    :func:`tracked_local_checkpoint` on this thread appends the RDD id
    it pinned. Nests: the innermost ledger wins, and the outer one is
    restored on exit (ids recorded inner are NOT re-recorded outer —
    the inner scope owns their cleanup)."""
    ids: list[int] = []
    prev = getattr(_LEDGER, "ids", None)
    _LEDGER.ids = ids
    try:
        yield ids
    finally:
        _LEDGER.ids = prev


def tracked_local_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager)`` that records the pinned RDD id in
    the open ledger (no-op recording when none is open)."""
    out = df.localCheckpoint(eager)
    ids = getattr(_LEDGER, "ids", None)
    if ids is not None:
        try:
            ids.append(int(out._jdf.queryExecution().analyzed().rdd().id()))
        except Exception:
            # tracking must never fail the query — but a silently inert
            # ledger reverts every batch to unbounded pinned-RDD growth
            # (ADVICE r7), so warn ONCE per process instead of nothing:
            # operators see the leak signal, not an eventual executor OOM
            global _WARNED_EXTRACTION
            if not _WARNED_EXTRACTION:
                _WARNED_EXTRACTION = True
                import warnings

                warnings.warn(
                    "tracked_local_checkpoint: JVM RDD-id extraction failed; "
                    "the checkpoint ledger is inert and localCheckpoint RDDs "
                    "will accumulate until the session ends",
                    RuntimeWarning,
                    stacklevel=2,
                )
    return out


_WARNED_EXTRACTION = False


def unpersist_ids(spark: SparkSession, ids: list[int]) -> None:
    """Release exactly the given persistent-RDD ids (non-blocking).
    Ids already gone are skipped; concurrent jobs' RDDs are untouched
    by construction."""
    try:
        jmap = spark.sparkContext._jsc.getPersistentRDDs()
        want = set(ids)
        for entry in jmap.entrySet().toArray():
            if int(entry.getKey()) in want:
                entry.getValue().unpersist(False)
    except Exception:
        pass  # cleanup must never fail the caller
