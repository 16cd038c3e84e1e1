"""Inclusion-dependency discovery: which column pairs are joinable —
candidate foreign keys surfaced FROM THE DATA, the data-catalog
profiling step (Aurum/Deequ-adjacent) that precedes every referential
contract this engine validates. ``referential`` checks a DECLARED
FK; this discovers the candidates: containment(A→B) =
|distinct(A) ∩ distinct(B)| / |distinct(A)| over every declared
column pair, emitted when it clears a threshold.

Scale shape: ONE stacked (table, column, value) relation per input
table → global distinct (map-side combinable — the wire carries
distinct values, not rows) → self-join on value → pair-count groupBy.
A value shared by k candidate columns contributes k·(k−1) pairs, so
the join output is bounded by |distinct values| × |columns|² — the
column list is small and declared, never the full schema cross
product. No driver-side loops; the containment matrix is
|columns|²-bounded metadata.

Numeric candidates are canonicalized to ``long`` before stringifying
so int32/int64 key pairs still match; strings compare verbatim. Other
types are rejected loudly — containment over floats or timestamps is
a smell, not a join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_INTEGRALS = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def _canonical(df: DataFrame, col: str) -> F.Column:
    dt = df.schema[col].dataType
    if isinstance(dt, _INTEGRALS):
        return F.col(col).cast("long").cast("string")
    if isinstance(dt, T.StringType):
        return F.col(col)
    raise ValueError(
        f"inclusion candidates must be integral or string columns: "
        f"{col} is {dt.simpleString()}"
    )


def inclusion_dependencies(
    tables: dict[str, DataFrame],
    candidates: dict[str, list[str]],
    min_containment: float = 0.9,
) -> DataFrame:
    """Containment matrix over the declared candidate columns.

    ``tables``: name → DataFrame; ``candidates``: table name → column
    list. Returns one row per ordered pair (a ⊆ b?) clearing
    ``min_containment``: (from_table, from_column, to_table, to_column,
    n_from, n_overlap, containment, exact) — ``exact`` means every
    distinct value of the candidate FK appears in the target
    (containment 1.0, the referential-integrity precondition).
    Same-table pairs are included (intra-table hierarchies are real);
    the self-pair (a, a) is not."""
    stacked = None
    for tname, df in tables.items():
        cols = candidates.get(tname) or []
        for c in cols:
            part = (
                df.select(_canonical(df, c).alias("value"))
                .filter(F.col("value").isNotNull())
                .select(
                    F.lit(f"{tname}.{c}").alias("col_id"),
                    "value",
                )
            )
            stacked = part if stacked is None else stacked.unionByName(part)
    if stacked is None:
        raise ValueError("no candidate columns declared")
    # persisted: the sizes agg and BOTH self-join sides read the
    # distinct relation — without it Spark re-unions and re-distincts
    # the candidate scans per branch (3 reads of every input table).
    # Lifetime is LRU-reclaimed block-manager state, same convention
    # as setsim_prefix_pairs' token relation
    dv = stacked.distinct().persist()
    sizes = dv.groupBy("col_id").agg(F.count("*").alias("n_from"))
    pairs = (
        dv.alias("a")
        .join(dv.alias("b"), "value")
        .filter(F.col("a.col_id") != F.col("b.col_id"))
        .groupBy(
            F.col("a.col_id").alias("from_id"),
            F.col("b.col_id").alias("to_id"),
        )
        .agg(F.count("*").alias("n_overlap"))
    )
    out = (
        pairs.join(
            F.broadcast(sizes.withColumnRenamed("col_id", "from_id")),
            "from_id",
        )
        .withColumn(
            "containment",
            F.round(F.col("n_overlap") / F.col("n_from"), 6),
        )
        .filter(F.col("containment") >= min_containment)
    )
    split_f = F.split("from_id", r"\.", 2)
    split_t = F.split("to_id", r"\.", 2)
    return out.select(
        split_f.getItem(0).alias("from_table"),
        split_f.getItem(1).alias("from_column"),
        split_t.getItem(0).alias("to_table"),
        split_t.getItem(1).alias("to_column"),
        "n_from",
        "n_overlap",
        "containment",
        (F.col("n_overlap") == F.col("n_from")).alias("exact"),
    )
