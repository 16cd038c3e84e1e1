"""Distributed Bloom-filter build + vectorized membership prefilter.

Backs the media_ref referential check: build a Bloom filter over the
catalog's key column (distributed: per-partition numpy bit arrays OR-ed
with treeReduce), broadcast the bits, and prefilter the big side with a
vectorized pandas UDF so the expensive exact anti-join only sees
probable orphans (+ FP rate ε of valid refs) instead of every span.

This complements Spark's own runtime bloom pruning
(``spark.sql.optimizer.runtime.bloomFilter.enabled`` — kept on in
session.py); the explicit variant is deterministic, sizable by config,
and usable outside join contexts (the north_rule asks for an explicit
broadcast Bloom filter).

Memory bound: bits = ~1.44 * n * log2(1/fpp) / 8 bytes on the driver and
per executor (e.g. 10^9 keys @ 1% fpp ≈ 1.2 GB — at that extreme,
raise fpp or shard the filter by key range).
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _optimal_params(n_items: int, fpp: float) -> tuple[int, int]:
    m = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n_items * math.log(2))) if n_items else 1
    return m, min(k, 16)


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, m: int) -> Iterator[np.ndarray]:
    """Double hashing: pos_i = (h1 + i*h2) mod m (Kirsch–Mitzenmacher)."""
    for i in range(k):
        with np.errstate(over="ignore"):
            yield ((h1 + np.uint64(i) * h2) % np.uint64(m)).astype(np.int64)


def build_bloom(df: DataFrame, col: str, n_items: int, fpp: float = 0.01):
    """Build (bits: np.ndarray[uint8], k, m) over df[col], distributed.

    Each partition builds a local bit array from xxhash64 pairs; arrays
    are OR-merged with treeReduce (log-depth, not a driver funnel).
    """
    m, k = _optimal_params(max(n_items, 1), fpp)
    hashed = df.select(
        F.xxhash64(F.col(col)).alias("h1"), F.xxhash64(F.col(col), F.lit(1)).alias("h2")
    )

    def to_bits(it):
        bits = np.zeros((m + 7) // 8, dtype=np.uint8)
        any_rows = False
        for pdf in it:
            if len(pdf) == 0:
                continue
            any_rows = True
            h1 = pdf["h1"].to_numpy(np.int64).view(np.uint64)
            h2 = pdf["h2"].to_numpy(np.int64).view(np.uint64)
            for pos in _positions(h1, h2, k, m):
                np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        if any_rows:
            yield pd.DataFrame({"bits": [bits.tobytes()]})

    # Per-partition bitmap rows (<= P rows of m/8 bytes each) are OR-merged
    # with treeAggregate: log-depth combine on executors, ~sqrt(P) partials
    # reach the driver instead of P (at 10^9 keys / 1% fpp that's the
    # difference between ~1.2 GB x sqrt(P) and x P through the driver).
    # Per-row Python here touches only the P partial rows, never data rows.
    partials = hashed.mapInPandas(to_bits, schema="bits binary")
    zero = np.zeros((m + 7) // 8, dtype=np.uint8)
    bits = partials.rdd.treeAggregate(
        zero,
        lambda acc, row: np.bitwise_or(acc, np.frombuffer(row.bits, dtype=np.uint8)),
        np.bitwise_or,
        depth=2,
    )
    return bits, k, m


def might_contain_udf(spark, bits: np.ndarray, k: int, m: int):
    """Vectorized membership test: Column fn over (h1, h2) hash columns.

    Bits ship once per executor via a Spark broadcast variable (not
    captured per-task in the closure).
    """
    bc = spark.sparkContext.broadcast(bits.tobytes())

    @F.pandas_udf("boolean")
    def _might_contain(h1s: pd.Series, h2s: pd.Series) -> pd.Series:
        b = np.frombuffer(bc.value, dtype=np.uint8)
        h1 = h1s.to_numpy(np.int64).view(np.uint64)
        h2 = h2s.to_numpy(np.int64).view(np.uint64)
        ok = np.ones(len(h1), dtype=bool)
        for pos in _positions(h1, h2, k, m):
            ok &= (b[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return pd.Series(ok)

    def apply(col: Column) -> Column:
        return _might_contain(F.xxhash64(col), F.xxhash64(col, F.lit(1)))

    return apply
