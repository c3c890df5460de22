"""Mergeable frequency sketches — Misra–Gries heavy hitters.

The frequency-domain sibling of the engine's existing sketch surface
(HLL cardinality partials in ``user_sketch_rollup``, KLL-style quantile
sketches): find the items whose frequency exceeds N/k over a corpus too
large (or a key domain too wide) to count exactly, with one pass and
O(k) state per partition.

Algorithm (Misra & Gries 1982, "Finding repeated elements"; the modern
mergeable treatment is Agarwal et al. 2012, "Mergeable summaries"):
keep at most ``k-1`` counters; an incoming item increments its counter
or claims a free one, and when all are full every counter decrements —
the streaming equivalent of crossing out k distinct items at once. A
single sequential pass underestimates any item by at most N/k (N =
total weight). The DISTRIBUTED composition here runs two sketch phases
— a per-partition pass, then a driver-side merge fold over the partial
summaries — and each phase's total decrement is ≤ N/k, so end to end:

- ``count_lo ≤ true_count ≤ count_lo + 2N/k`` for reported items;
- **no false negatives above the bound**: every item with true
  frequency > 2N/k is guaranteed present (pick k = 2/φ for a target
  support threshold φ).

Merging two summaries (pairwise counter add, then trim back to k-1 by
subtracting the k-th largest count) preserves both properties with the
combined N — that mergeability is exactly what makes the sketch
MapReduce/Spark-shaped: one ``mapInPandas`` pass emits a k-sized
summary per partition (a dict over an Arrow batch stream — numpy-free
by design, the inner loop is a hash-map update), and the driver folds
the ≤ num_partitions summaries. Nothing corpus-sized ever shuffles or
reaches the driver: the reduction payload is (partitions × k) rows
regardless of N, the same discipline as ``pca_fit``'s moment rows.

Use the exact ``groupBy.count`` path when the key domain fits a
shuffle; use this when it doesn't (open vocabularies, URL domains,
user agents at 100 TB) — the canonical "top talkers" regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _mg_update(counters: dict, item, w: int, cap: int) -> None:
    """One weighted Misra-Gries update against a bounded counter map."""
    while True:
        if item in counters:
            counters[item] += w
            return
        if len(counters) < cap:
            counters[item] = w
            return
        # all counters occupied: decrement everything by the largest
        # amount the new item allows (batch form of the classic -1 step)
        dec = min(w, min(counters.values()))
        dead = []
        for key in counters:
            counters[key] -= dec
            if counters[key] == 0:
                dead.append(key)
        for key in dead:
            del counters[key]
        w -= dec
        if w <= 0:
            return


def _mg_merge(a: dict, b: dict, cap: int) -> dict:
    """Merge two summaries (Agarwal et al. 2012): add counters, then if
    over capacity subtract the (cap+1)-th largest count from all and
    drop non-positives — both error bounds compose additively."""
    out = dict(a)
    for key, w in b.items():
        out[key] = out.get(key, 0) + w
    if len(out) > cap:
        cut = sorted(out.values(), reverse=True)[cap]
        out = {key: w - cut for key, w in out.items() if w - cut > 0}
    return out


def heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 64,
    weight_col: str | None = None,
) -> list[tuple[object, int]]:
    """Misra-Gries heavy hitters over ``item_col``: returns the summary
    as ``[(item, count_lo), ...]`` sorted by count descending, at most
    ``k-1`` entries, items stringified by the summary schema. Every
    item with true frequency > 2N/k is present, and ``count_lo ≤
    true_count ≤ count_lo + 2N/k`` (N = total weight; one N/k from the
    partition pass, one from the merge fold — see module docstring).

    One distributed pass (per-partition summaries via ``mapInPandas``,
    ≤ k-1 rows each) + a driver fold of ≤ num_partitions summaries —
    the driver holds O(partitions · k) entries, never the key domain.
    ``weight_col`` generalizes to weighted frequency (e.g. bytes per
    URL domain instead of hits).
    """
    import pandas as pd

    cap = k - 1
    if cap < 1:
        raise ValueError("k must be >= 2")

    def partial(batches):
        counters: dict = {}
        for pdf in batches:
            items = pdf[item_col]
            weights = pdf[weight_col] if weight_col else None
            for i in range(len(pdf)):
                w = int(weights.iloc[i]) if weight_col else 1
                if w > 0:
                    _mg_update(counters, items.iloc[i], w, cap)
        if counters:
            yield pd.DataFrame(
                {"item": list(counters), "w": list(counters.values())}
            )

    from pyspark.sql import functions as F

    rows = (
        # the partial-summary schema is `item string` — cast up front so
        # non-string keys (a bigint user_id is the canonical top-talkers
        # key) stringify in the JVM instead of tripping an Arrow type
        # mismatch inside mapInPandas
        df.select(
            F.col(item_col).cast("string").alias(item_col),
            *([weight_col] if weight_col else []),
        )
        .mapInPandas(partial, "item string, w long")
        # canonical fold order: the fold's near-zero tail is
        # order-dependent, and collect() alone returns partitions in
        # completion order — sorting makes the result a pure function
        # of the input partitioning
        .orderBy(F.desc("w"), "item")
        .collect()
    )
    # fold row-by-row: a single counter row is itself a zero-error
    # summary of its weight, and the merge bound holds for ANY merge
    # tree over valid summaries, so flattening the per-partition
    # structure costs nothing beyond the documented fold N/k term
    merged: dict = {}
    for r in rows:
        merged = _mg_merge(merged, {r["item"]: r["w"]}, cap)
    return sorted(merged.items(), key=lambda kv: (-kv[1], str(kv[0])))
