"""Deterministic stratified sampling — training-data mixture control.

A pretraining pipeline mixes sources at prescribed ratios ("k docs per
stratum", or fractions per source). Spark's ``sampleBy`` is
probabilistic (binomial per row: approximate counts, seed-and-
partitioning dependent); pipelines that must be reproducible across
runs and engines need EXACT per-stratum counts with a deterministic,
data-independent ordering. This samples the top-k rows per stratum in
md5(id) order — a stable pseudo-random permutation any engine can
replay (the DuckDB oracle sorts by the same md5), so re-runs,
backfills, and audits select byte-identical rows.

Scale shape: one hash exchange on the stratum column; Spark's rank-
limit pushdown (WindowGroupLimit) truncates each partition to its
local top-k BEFORE the shuffle, so the exchange carries at most
k × partitions rows per stratum, not the stratum's full population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, picked by md5(id)
    order (deterministic, engine-replayable). Adds ``sample_rank``
    (1-based within the stratum)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
