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

Within-chunk values are computed by pandas ``ewm`` itself (bitwise the
reference recursion); only the O(P) cross-chunk combines re-associate
float ops, so results agree with the sequential reference to ~1 ulp per
boundary — far inside the 6-dp rounding every consumer applies.

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

        def run_maps(vals: pd.Series):
            """Compose a run of consecutive values into affine-map form.

            b: map evaluated from state 0 — pandas ewm over the run with
            a 0 prepended reproduces the recursion bit-for-bit.
            b_first: evaluated under the first-element rule (plain ewm).
            a_run: (1-α)^m; underflow to 0.0 for huge runs is exact
            enough (the old state's weight is genuinely ~0 there).
            """
            m = len(vals)
            a_run = a**m
            b = float(
                pd.concat([pd.Series([0.0]), vals], ignore_index=True)
                .ewm(alpha=alpha, adjust=False)
                .mean()
                .iloc[-1]
            )
            b_first = float(
                vals.ewm(alpha=alpha, adjust=False).mean().iloc[-1]
            )
            return m, a_run, b, b_first

        for pdf in iterator:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            keys = pdf[key_col].to_numpy()
            # consecutive runs of equal key within the (sorted) batch
            change = np.flatnonzero(keys[1:] != keys[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [len(keys)]))
            out_rows = []
            for s, e in zip(starts, ends):
                k = keys[s]
                m, a_run, b, b_first = run_maps(
                    pdf[value_col].iloc[s:e].reset_index(drop=True)
                )
                if cur is not None and cur[0] == k:
                    # continue the open key: compose generic map into both
                    _, _, n0, A0, B0, Bf0 = cur
                    cur = (
                        k,
                        pid,
                        n0 + m,
                        A0 * a_run,
                        B0 * a_run + b,
                        Bf0 * a_run + b,
                    )
                else:
                    if cur is not None:
                        out_rows.append(cur)
                    cur = (k, pid, m, a_run, b, b_first)
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

    out_schema = f"{key_col} long, n_events long, ewma_last double"

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_pid", kind="stable").reset_index(drop=True)
        s = pdf["_Bf"].iloc[0]  # first segment: first-element rule
        for i in range(1, len(pdf)):
            s = pdf["_B"].iloc[i] + pdf["_A"].iloc[i] * s
        return pd.DataFrame(
            {
                key_col: [int(pdf["_key"].iloc[0])],
                "n_events": [int(pdf["_n"].sum())],
                "ewma_last": [round(float(s), round_dp)],
            }
        )

    return seg_df.groupBy("_key").applyInPandas(combine, out_schema)
