"""Golden-record consolidation: merge each duplicate cluster into ONE
canonical row under per-field survivorship policies — the step after
dedup decides WHO survives, this decides WHAT the survivor's fields
say (classic MDM survivorship; in a training pipeline: fold near-dup
document variants into one record keeping the best metadata from
each copy).

Policies (all deterministic, so the output is an oracle-able
contract, never a "first row Spark happened to see"):

* ``max`` / ``min`` — field extremum over the cluster
* ``longest`` — longest string; ties break to the lexicographically
  LARGEST among the longest (max of (length, value) structs)
* ``first`` — the value carried by the cluster's smallest ``id_col``
  among rows where the field is non-null
* ``mode`` — most frequent value; ties break to the lexicographically
  largest value at the winning count

Scale shape: one map-side-combinable agg per cluster covers every
non-mode policy in a single pass. Mode fields stack into ONE
(cluster, field, value) count shuffle (map-side combined — the wire
carries distinct values per cluster, not rows), a rank window over
that metadata-scale count table, and one aggregated-to-aggregated
join back on cluster. No driver loops, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

POLICIES = ("max", "min", "longest", "first", "mode")


def golden_records(
    df: DataFrame,
    cluster_col: str,
    policies: dict[str, str],
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per cluster: ``cluster_col``, ``n_members``, and one
    column per policy field (original names). ``df`` already carries
    the cluster assignment (e.g. ``duplicate_clusters``'s output
    joined back, or any grouping key)."""
    bad = {f: p for f, p in policies.items() if p not in POLICIES}
    if bad:
        raise ValueError(f"unknown survivorship policies: {bad}")
    missing = [f for f in policies if f not in df.columns]
    if missing:
        raise ValueError(f"policy fields absent from frame: {missing}")

    aggs = [F.count(F.lit(1)).alias("n_members")]
    mode_fields: list[str] = []
    for field, pol in policies.items():
        c = F.col(field)
        if pol == "max":
            aggs.append(F.max(c).alias(field))
        elif pol == "min":
            aggs.append(F.min(c).alias(field))
        elif pol == "longest":
            aggs.append(
                F.max(
                    F.when(
                        c.isNotNull(), F.struct(F.length(c).alias("l"), c.alias("v"))
                    )
                )["v"].alias(field)
            )
        elif pol == "first":
            aggs.append(
                F.min(
                    F.when(
                        c.isNotNull(),
                        F.struct(F.col(id_col).alias("i"), c.alias("v")),
                    )
                )["v"].alias(field)
            )
        else:
            mode_fields.append(field)
    out = df.groupBy(cluster_col).agg(*aggs)

    if mode_fields:
        # one stacked count shuffle for ALL mode fields; values travel
        # as strings in the long form and are re-picked from the
        # original column after the join (so non-string mode fields
        # keep their type)
        stack_args = ", ".join(
            f"'{f}', cast(`{f}` as string)" for f in mode_fields
        )
        long = df.select(
            cluster_col,
            F.expr(
                f"stack({len(mode_fields)}, {stack_args})"
            ).alias("_field", "_value"),
        ).filter(F.col("_value").isNotNull())
        counts = long.groupBy(cluster_col, "_field", "_value").agg(
            F.count(F.lit(1)).alias("_n")
        )
        w = Window.partitionBy(cluster_col, "_field").orderBy(
            F.col("_n").desc(), F.col("_value").desc()
        )
        winners = (
            counts.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .groupBy(cluster_col)
            .pivot("_field", mode_fields)
            .agg(F.first("_value"))
        )
        # re-type: the pivot carries strings; cast back per field
        types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
        winners = winners.select(
            cluster_col,
            *[
                F.col(f).cast(types[f]).alias(f)
                for f in mode_fields
            ],
        )
        out = out.join(winners, cluster_col, "left")
    return out
