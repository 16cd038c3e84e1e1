"""Schema-contract validation: the declarative "schema" half of
schema + constraint validation.

A :class:`Contract` declares what a table MUST look like — required
columns with expected Spark types and nullability, plus optional
data-level rules per column (max null rate, allowed value set, numeric
range, regex format). Validation happens in two tiers:

1. **Structural** (driver-side, zero scans): the observed
   ``df.schema`` is diffed against the contract — missing columns,
   unexpected extras (if ``closed``), type mismatches, nullability
   violations. At 10^12 rows this tier is free: it reads table
   metadata, never data.
2. **Data-level** (ONE aggregation pass): every declared rule compiles
   to a conditional-count aggregate expression, all evaluated in a
   single map-side-combinable ``df.agg`` — the same one-scan shape as
   ``operators/profile.py``; no shuffle beyond the one partial-agg
   exchange, no UDFs.

The reference has no schema layer at all (SQLite tables are created
ad hoc, /root/reference/database_manager.py:28-78); this is the
engine-native generalization the validation north star asks for.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass(frozen=True)
class ColumnRule:
    """Declarative expectations for one column."""

    dtype: str | None = None           # Spark simpleString, e.g. "bigint"
    nullable: bool = True              # False -> nulls are violations
    max_null_rate: float | None = None
    allowed: tuple | None = None       # closed value set
    min_value: float | None = None
    max_value: float | None = None
    rlike: str | None = None           # format regex (strings)


@dataclass(frozen=True)
class Contract:
    columns: dict[str, ColumnRule] = field(default_factory=dict)
    closed: bool = False               # True -> extra columns violate


def schema_diff(observed: T.StructType, contract: Contract) -> list[dict]:
    """Structural diff (no data access): one dict per issue."""
    issues: list[dict] = []
    seen = {f.name: f for f in observed.fields}
    for name, rule in contract.columns.items():
        f = seen.get(name)
        if f is None:
            issues.append({"column": name, "issue": "missing_column",
                           "detail": "declared but absent"})
            continue
        if rule.dtype is not None and f.dataType.simpleString() != rule.dtype:
            issues.append({
                "column": name, "issue": "type_mismatch",
                "detail": f"expected {rule.dtype},"
                          f" got {f.dataType.simpleString()}",
            })
        if not rule.nullable and f.nullable:
            # metadata says nulls possible; the data tier still counts
            # actual nulls — this flags the declared shape only
            issues.append({"column": name, "issue": "nullable_mismatch",
                           "detail": "contract requires NOT NULL"})
    if contract.closed:
        for name in seen:
            if name not in contract.columns:
                issues.append({"column": name, "issue": "unexpected_column",
                               "detail": "table is closed"})
    return issues


def contract_violation_counts(df: DataFrame, contract: Contract) -> DataFrame:
    """Data tier: ONE agg pass → long-form (column, rule, n_violations,
    violation_rate). Only rules for columns present in ``df`` compile."""
    present = set(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    keys: list[tuple[str, str]] = []

    def add(c: str, rule: str, cond) -> None:
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"{c}::{rule}")
        )
        keys.append((c, rule))

    for c, rule in contract.columns.items():
        if c not in present:
            continue
        col = F.col(c)
        if not rule.nullable or rule.max_null_rate is not None:
            add(c, "null", col.isNull())
        if rule.allowed is not None:
            add(c, "allowed", col.isNotNull() & ~col.isin(*rule.allowed))
        if rule.min_value is not None:
            add(c, "min_value", col < F.lit(rule.min_value))
        if rule.max_value is not None:
            add(c, "max_value", col > F.lit(rule.max_value))
        if rule.rlike is not None:
            add(c, "rlike", col.isNotNull() & ~col.rlike(rule.rlike))

    one = df.agg(*aggs)
    triples = ", ".join(
        f"'{c}', '{r}', cast(`{c}::{r}` as double)" for c, r in keys
    )
    return one.selectExpr(
        "__n", f"stack({len(keys)}, {triples}) as (column, rule, n_violations)"
    ).select(
        "column",
        "rule",
        F.col("n_violations").cast("long").alias("n_violations"),
        F.round(F.col("n_violations") / F.col("__n"), 6).alias(
            "violation_rate"
        ),
    )


def contract_verdicts(df: DataFrame, contract: Contract) -> DataFrame:
    """Verdict rows for both tiers. Structural issues always fail;
    data rules fail when the rate exceeds the column's max_null_rate
    (null rule with a rate budget) or when any row violates (all other
    rules, and null with nullable=False)."""
    spark = df.sparkSession
    struct_rows = [
        ("schema:" + i["issue"], i["column"], None, None, "fail",
         i["detail"])
        for i in schema_diff(df.schema, contract)
    ]
    structural = spark.createDataFrame(
        struct_rows,
        "check string, column string, n_violations long,"
        " violation_rate double, verdict string, detail string",
    )
    counts = contract_violation_counts(df, contract)

    def budget(c: str) -> float:
        r = contract.columns[c].max_null_rate
        return r if r is not None else 0.0

    budget_map = F.create_map(
        *[x for c in contract.columns
          for x in (F.lit(c), F.lit(budget(c)))]
    )
    data = counts.select(
        F.concat(F.lit("rule:"), "rule").alias("check"),
        "column",
        "n_violations",
        "violation_rate",
        F.when(
            (F.col("rule") == "null")
            & (F.col("violation_rate") <= budget_map[F.col("column")]),
            "pass",
        )
        .when(F.col("n_violations") == 0, "pass")
        .otherwise("fail")
        .alias("verdict"),
        F.lit(None).cast("string").alias("detail"),
    )
    return structural.unionByName(data)
