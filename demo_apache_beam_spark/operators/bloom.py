"""Broadcast Bloom-filter semi-join pruning.

The exact-set broadcast join (``corpus_decontamination``) assumes the
probe side fits executor memory as a hash set. At real benchmark-
decontamination scale it often doesn't: hundreds of millions of eval
shingles are tens of GB as strings, but only a few hundred MB as Bloom
*bits*. The standard play — what Spark's own runtime-filter optimizer
(InjectRuntimeFilter) does for equi-joins, made explicit here so it
composes with arbitrary downstream logic — is:

1. build an ``m``-bit Bloom bitset from the probe side DISTRIBUTEDLY
   (each partition sets bits into its own ``m/8``-byte array, the driver
   ORs the per-partition arrays — never the strings);
2. broadcast the bitset (bits, not strings) and prefilter the corpus
   side with a vectorized Arrow probe — no false negatives, tunably few
   false positives;
3. run the EXACT join only over the survivors, which removes the false
   positives, so the composed result is bit-identical to the plain join
   at a fraction of the shuffle.

Hashing is Kirsch–Mitzenmacher double hashing: two JVM-side ``xxhash64``
values per key expand to ``num_hashes`` positions ``(h1 + i·h2) & (m-1)``
inside numpy — build and probe share the identical position math by
construction (same function), which is what makes "no false negatives"
a structural property rather than a hope.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _positions(
    h1: np.ndarray, h2: np.ndarray, m_bits: int, num_hashes: int
) -> np.ndarray:
    """(n, num_hashes) bit positions; identical math for build and probe.

    ``h2 | 1`` keeps the stride odd so the probe sequence cycles the full
    power-of-two table; uint64 wraparound is well-defined in numpy.
    """
    h1 = h1.astype(np.uint64)
    h2 = h2.astype(np.uint64) | np.uint64(1)
    i = np.arange(num_hashes, dtype=np.uint64)
    return ((h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m_bits - 1)).astype(
        np.int64
    )


def _with_hashes(df: DataFrame, key_col: str) -> DataFrame:
    """Attach the two 64-bit hashes JVM-side (whole-stage codegen), so
    Python only ever sees two longs per row — never the key strings."""
    return df.withColumn("_h1", F.xxhash64(key_col)).withColumn(
        "_h2", F.xxhash64(key_col, F.lit(1))
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> np.ndarray:
    """Build the Bloom bitset from ``keys[key_col]`` — returns a numpy
    uint8 array of ``m_bits/8`` bytes.

    Each partition aggregates its keys into a local bitset inside one
    Arrow pass; the driver receives one ``m/8``-byte row per output
    batch and ORs them — driver traffic is O(partitions · m/8), never
    O(keys).
    """
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    hashed = _with_hashes(keys, key_col).select("_h1", "_h2")

    def to_bits(iterator):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        touched = False
        for pdf in iterator:
            if len(pdf) == 0:
                continue
            touched = True
            pos = _positions(
                pdf["_h1"].to_numpy(), pdf["_h2"].to_numpy(), m_bits, num_hashes
            ).ravel()
            np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if touched:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = hashed.mapInPandas(to_bits, "bits binary").collect()
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for row in parts:
        out |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


def bloom_prefilter(
    df: DataFrame,
    bits: np.ndarray,
    key_col: str,
    m_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Keep only rows whose ``key_col`` *may* be in the set the bitset
    was built from (all ``num_hashes`` bits set). No false negatives;
    follow with the exact join to drop false positives."""
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(bits)

    @pandas_udf("boolean")
    def maybe_member(h1: pd.Series, h2: pd.Series) -> pd.Series:
        b = bc.value
        pos = _positions(h1.to_numpy(), h2.to_numpy(), m_bits, num_hashes)
        hit = (b[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(hit.all(axis=1))

    # asNondeterministic stops the optimizer from CLONING the probe: a
    # downstream equi-join on key_col lets constraint inference copy
    # this filter (as maybe_member(xxhash64(key), ...)) onto the OTHER
    # join side — where it is a no-op by construction (that side built
    # the bitset) but still pays a full Arrow pass over its rows. The
    # UDF is genuinely deterministic; the flag only pins it where it
    # was placed (guide §4.4 discipline).
    probe = maybe_member.asNondeterministic()
    return (
        _with_hashes(df, key_col)
        .filter(probe(F.col("_h1"), F.col("_h2")))
        .drop("_h1", "_h2")
    )
