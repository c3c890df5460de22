"""Scoped checkpoint tracking: cleanup must free exactly the RDDs the
tracked scope created — a concurrent job's checkpoint taken during the
window must survive (localCheckpoint truncates lineage, so unpersisting
it is unrecoverable), and the scope's own blocks must all be released."""

from __future__ import annotations

import threading

from demo_apache_beam_spark.operators.checkpoints import (
    track_checkpoints,
    tracked_local_checkpoint,
    unpersist_ids,
)


def _persistent_ids(spark):
    return {
        int(k)
        for k in spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def test_cleanup_spares_concurrent_checkpoints(spark):
    """A plain localCheckpoint taken while a ledger is open (the
    concurrent-job stand-in: the r6 global before/after diff would have
    unpersisted it) survives unpersist_ids, stays in the persistent map,
    and is still collectable; the tracked checkpoints are all gone."""
    with track_checkpoints() as ids:
        mine = tracked_local_checkpoint(spark.range(100).selectExpr("id * 2 AS v"))
        theirs = spark.range(50).selectExpr("id + 1 AS w").localCheckpoint()
        mine.count()
    assert ids and set(ids) <= _persistent_ids(spark)
    unpersist_ids(spark, ids)
    remaining = _persistent_ids(spark)
    assert not (set(ids) & remaining)
    theirs_id = int(theirs._jdf.queryExecution().analyzed().rdd().id())
    assert theirs_id in remaining
    assert theirs.count() == 50  # blocks intact, not just map entry
    theirs.rdd.unpersist()


def test_ledger_is_thread_local(spark):
    """A checkpoint taken on ANOTHER thread while this thread's ledger
    is open must not land in it (each foreachBatch thread owns exactly
    its own batch's checkpoints)."""
    other_ids = []

    def other_thread():
        df = tracked_local_checkpoint(spark.range(10))
        other_ids.append(int(df._jdf.queryExecution().analyzed().rdd().id()))

    with track_checkpoints() as ids:
        t = threading.Thread(target=other_thread)
        t.start()
        t.join()
    assert ids == []
    unpersist_ids(spark, other_ids)


def test_untracked_is_plain_checkpoint(spark):
    """Outside any ledger the helper must behave exactly like
    df.localCheckpoint(): materialized, pinned, correct rows."""
    df = tracked_local_checkpoint(spark.range(7).selectExpr("id AS x"))
    rid = int(df._jdf.queryExecution().analyzed().rdd().id())
    assert rid in _persistent_ids(spark)
    assert df.count() == 7
    unpersist_ids(spark, [rid])


def test_topk_store_upsert_leaves_no_pinned_rdds(spark, tmp_path):
    """Each upsert_batch checkpoints its merged slice; the blocks must be
    released once the overwrite is durable — a long-running stream would
    otherwise pin one RDD per micro-batch forever."""
    from demo_apache_beam_spark.streaming.topk import TableTopKStore

    store = TableTopKStore(spark, str(tmp_path / "store"), k=2)
    before = _persistent_ids(spark)
    for batch in range(3):
        store.upsert_batch(
            spark.createDataFrame(
                [(f"2025-01-01 0{batch}:00:00", "TeamA", 10 + batch),
                 (f"2025-01-01 0{batch}:00:00", "TeamB", 5)],
                "window_start string, team string, total_score long",
            )
        )
    assert _persistent_ids(spark) <= before
    assert store.topk_df().count() > 0


def test_near_dedup_batch_leaves_no_pinned_rdds(spark, tmp_path):
    """End-to-end: one ingest batch (which checkpoints bands, survivors,
    and every connected-components round internally) must release all of
    them once its writes are durable."""
    from demo_apache_beam_spark.streaming.dedup import make_near_dedup_ingest

    ingest = make_near_dedup_ingest(
        spark, str(tmp_path / "out"), str(tmp_path / "store")
    )
    before = _persistent_ids(spark)
    batch = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the bridge"),
            (2, "data pipelines shuffle terabytes across executors at night"),
        ],
        "doc_id long, text string",
    )
    ingest(batch, 0)
    assert _persistent_ids(spark) <= before
