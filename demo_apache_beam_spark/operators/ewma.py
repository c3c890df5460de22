"""Segmented-scan EWMA: per-key exponential smoothing with NO per-key
task bound.

The recursion s_t = α·x_t + (1-α)·s_{t-1} (pandas ``ewm(adjust=False)``,
first element s_1 = x_1) looks inherently sequential, but each element is
an affine map s ↦ a·s + b with a = (1-α), b = α·x, and affine maps
compose associatively:  (a₂,b₂)∘(a₁,b₁) = (a₁a₂, a₂b₁ + b₂).  So a
chunk of consecutive elements collapses to ONE composed map, and chunks
combine in order — a textbook segmented scan (Blelloch 1990).

Why this matters at 100 TB: the naive formulation
(``groupBy(key).applyInPandas``) serializes each key's FULL history into
a single task — the injector's designed workload has robot hot keys, so
one robot user becomes one straggler task and, at scale, one OOM.  Here
instead:

1. rows are range-partitioned by (key, order...) — a hot key's history
   is SPLIT across partitions at sampled boundaries, each partition
   holding a bounded slice;
2. one streaming ``mapInPandas`` pass per partition emits a per-
   (partition, key) segment summary — (n, A, B, B_first) — never
   materializing the partition (state per open key is 5 scalars, Arrow
   batches stream through);
3. a final ``groupBy(key)`` over the TINY segment table (≤ P segments
   per key, P = shuffle partitions) composes segments in partition
   order.  Partition order IS event order because the range partitioner
   sorts by the same composite key.

Within-chunk maps are evaluated in closed form — one vectorized
``Σ α·(1-α)^(m-1-i)·x_i`` per run via numpy ``reduceat`` over the whole
Arrow batch, no per-run pandas calls (those dominated wall time at ~1 ms
of fixed ``ewm`` overhead × one call per key).  The forward weighted sum
re-associates the Horner-order recursion's float ops, as do the O(P)
cross-chunk combines; both agree with the sequential reference to a few
ulp — far inside the 6-dp rounding every consumer applies.

B_first is the chunk's map evaluated under the FIRST-ELEMENT rule
(s_1 = x_1) — only the key's globally-first segment uses it; later
segments use the generic (A, B) map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def ewma_last_per_key(
    df: DataFrame,
    key_col: str,
    order_cols: list[str],
    value_col: str,
    alpha: float = 0.3,
    num_partitions: int | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """(key, n_events, ewma_last) — final adjust=False EWMA per key.

    ``num_partitions`` overrides the range-partition count (tests use a
    small value to force hot keys across several segments).
    """
    a = 1.0 - alpha
    parts = [df[c] for c in (key_col, *order_cols)]
    ordered = (
        df.repartitionByRange(num_partitions, *parts)
        if num_partitions
        else df.repartitionByRange(*parts)
    ).sortWithinPartitions(key_col, *order_cols)
    # narrow projection after the sort: partition id rides along so the
    # combine can order segments without trusting shuffle file order
    tagged = ordered.withColumn("_pid", F.spark_partition_id())

    def segments(iterator):
        # streaming state for the partition's currently-open key:
        # key, pid, n, A, B, B_first  (5 scalars — O(1) memory)
        cur = None

        for pdf in iterator:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            keys = pdf[key_col].to_numpy()
            x = pdf[value_col].to_numpy(dtype=np.float64)
            # consecutive runs of equal key within the (sorted) batch
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(keys)]))
            m = ends - starts  # run lengths
            # Closed-form affine map per run, fully vectorized over the
            # batch (no per-run pandas calls — those dominate wall time):
            #   from state 0:  b  = Σ_i α·a^{m-1-i}·x_i   (i 0-based)
            #   first-element: b' = a^{m-1}·x_0 + Σ_{i≥1} α·a^{m-1-i}·x_i
            #   a_run = a^m; a^huge underflows to exact-enough 0.0 (the
            #   old state's weight genuinely IS ~0 there).
            pos = np.arange(len(keys)) - np.repeat(starts, m)
            expo = (np.repeat(m, m) - 1 - pos).astype(np.float64)
            w = alpha * np.power(a, expo)
            b_arr = np.add.reduceat(w * x, starts)
            wf = w.copy()
            wf[starts] = np.power(a, (m - 1).astype(np.float64))
            bf_arr = np.add.reduceat(wf * x, starts)
            a_arr = np.power(a, m.astype(np.float64))
            out_rows = []
            for j, s in enumerate(starts):
                k = keys[s]
                mj, a_run, b, b_first = (
                    int(m[j]),
                    float(a_arr[j]),
                    float(b_arr[j]),
                    float(bf_arr[j]),
                )
                if cur is not None and cur[0] == k:
                    # continue the open key: compose generic map into both
                    _, _, n0, A0, B0, Bf0 = cur
                    cur = (
                        k,
                        pid,
                        n0 + mj,
                        A0 * a_run,
                        B0 * a_run + b,
                        Bf0 * a_run + b,
                    )
                else:
                    if cur is not None:
                        out_rows.append(cur)
                    cur = (k, pid, mj, a_run, b, b_first)
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["_key", "_pid", "_n", "_A", "_B", "_Bf"],
                )
        if cur is not None:
            yield pd.DataFrame(
                [cur], columns=["_key", "_pid", "_n", "_A", "_B", "_Bf"]
            )

    seg_schema = "_key long, _pid int, _n long, _A double, _B double, _Bf double"
    seg_df = tagged.mapInPandas(segments, seg_schema)

    # Cross-segment combine stays entirely JVM-side: each key has ≤ P
    # segments (one per range partition it touches), so collect_list is
    # bounded by the partition count, array_sort orders them by _pid
    # (struct sort is lexicographic, _pid is the leading field and unique
    # per key), and a higher-order aggregate folds the affine maps in
    # partition order — no second Python stage, whole-stage codegen does
    # the fold.
    segs = F.array_sort(F.collect_list(F.struct("_pid", "_A", "_B", "_Bf")))
    agg = seg_df.groupBy("_key").agg(
        F.sum("_n").alias("n_events"), segs.alias("_segs")
    )
    folded = F.aggregate(
        F.expr("slice(_segs, 2, size(_segs) - 1)"),
        F.col("_segs")[0]["_Bf"],  # first segment: first-element rule
        lambda acc, seg: seg["_B"] + seg["_A"] * acc,
    )
    return agg.select(
        F.col("_key").alias(key_col),
        "n_events",
        F.round(folded, round_dp).alias("ewma_last"),
    )
