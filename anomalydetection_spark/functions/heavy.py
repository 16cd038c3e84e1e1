"""Exact distributed heavy hitters: Misra-Gries candidate pruning +
one exact verification pass.

The 100 TB shape for "top-k most frequent values of a column": a plain
groupBy on a high-cardinality column shuffles one row per DISTINCT
value — fine for token vocabularies, ruinous for URLs/ids. The
two-pass trick bounds the shuffle by k instead:

1. Per-partition Misra-Gries summaries (k counters each, one
   Arrow-batched pass, no shuffle). MG guarantees any value with
   global frequency > N/(k+1) survives in at least one partition's
   summary, so the union of partition candidates (≤ k × partitions
   values, metadata-scale) is a SUPERSET of every true heavy hitter.
2. Exact counts for the candidate set only — a filtered groupBy whose
   key space is the bounded candidate set, then top-k with a
   deterministic tie-break.

The output is EXACT (the sketch only prunes, never decides), which is
why the driver oracle can check it against a plain GROUP BY / LIMIT
(queries.py::heavy_hitters). The MG retention guarantee itself is
property-tested (tests/test_properties.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mg_summarize(values, k: int) -> dict:
    """Misra-Gries summary of an iterable: at most k counters.
    Guarantee: est[v] ≥ true[v] − n/(k+1), so any v with
    true[v] > n/(k+1) has a counter."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            for key in list(counters):
                counters[key] -= 1
                if counters[key] == 0:
                    del counters[key]
    return counters


def mg_merge(summaries, k: int) -> dict:
    """Merge MG summaries (add counts, then decrement-evict back to k
    counters) — keeps the additive error bound Σ n_i/(k+1)."""
    total: dict = {}
    for s in summaries:
        for v, c in s.items():
            total[v] = total.get(v, 0) + c
    while len(total) > k:
        m = min(total.values())
        total = {v: c - m for v, c in total.items() if c - m > 0}
    return total


def heavy_hitters(
    df: DataFrame, col: str, k: int = 64, top: int = 20
) -> DataFrame:
    """Exact top-``top`` values of ``col`` by count, computed with a
    bounded shuffle: MG(k) candidates per partition → exact counts of
    the candidate union → rank by (count desc, value asc). ``k`` must
    be ≥ the number of values you expect above the N/(k+1) frequency
    floor; ``top`` ≤ k."""
    import pandas as pd

    def _partials(batches):
        counters: dict = {}
        for pdf in batches:
            for v in pdf[col].dropna():
                if v in counters:
                    counters[v] += 1
                elif len(counters) < k:
                    counters[v] = 1
                else:
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        yield pd.DataFrame({"candidate": list(counters.keys())})

    cand_rows = (
        df.select(col)
        .mapInPandas(_partials, schema="candidate string")
        .distinct()
        .collect()
    )
    candidates = [r.candidate for r in cand_rows]
    if len(candidates) <= 10_000:
        scoped = df.filter(F.col(col).isin(candidates))
    else:
        # k × partitions can reach millions on a big cluster — as plan
        # literals that bloats the query; ship them as a broadcast
        # semi-join instead
        cand_df = df.sparkSession.createDataFrame(
            [(c,) for c in candidates], f"{col} string"
        )
        scoped = df.join(F.broadcast(cand_df), col, "left_semi")
    exact = scoped.groupBy(F.col(col).alias("value")).agg(
        F.count("*").alias("count")
    )
    w = Window.orderBy(F.desc("count"), F.asc("value"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
    )
