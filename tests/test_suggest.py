"""Constraint suggestion: rules derive from observed data, and the
profiled table passes its own suggested contract by construction."""

import pyspark.sql.functions as F

from anomalydetection_spark.operators.contract import (
    contract_from_dict,
    contract_verdicts,
)
from anomalydetection_spark.operators.suggest import (
    suggest_contract,
    suggest_rules,
)


def _tbl(spark):
    return spark.range(1000).select(
        F.col("id").alias("event_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("purchase")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("event_type"),
        F.when(F.col("id") % 20 == 0, None)
        .otherwise((F.col("id") % 50).cast("double"))
        .alias("value"),
        F.concat(F.lit("u"), F.col("id") % 100).alias("user"),
    )


def test_rules_derive_from_data(spark):
    sug = {
        (r["column"], r["rule"]): r
        for r in suggest_rules(_tbl(spark), exact_distinct=True).collect()
    }
    # no nulls in event_id -> not_null; value has 5% nulls -> 2x budget
    assert ("event_id", "not_null") in sug
    v = sug[("value", "max_null_rate")]
    assert v["num_value"] == 0.1
    # numeric range: bounds are valid for ANYTHING consistent with the
    # 4dp-rounded profile — a stored min of exactly 0.0 could hide a
    # true min just below zero, so the non-negative bound is padded by
    # the rounding quantum; max gets 10% slack plus the quantum
    assert sug[("value", "min_value")]["num_value"] == -5e-5
    assert sug[("value", "max_value")]["num_value"] == 49.0 + 4.9 + 5e-5
    assert sug[("event_id", "min_value")]["num_value"] == -5e-5
    # low-cardinality string -> sorted closed set; 100-distinct user: none
    assert sug[("event_type", "allowed")]["str_value"] == "click,purchase,view"
    assert ("user", "allowed") not in sug
    # exact-distinct uniqueness gate: only the id column
    uniques = [c for (c, rule) in sug if rule == "unique_candidate"]
    assert uniques == ["event_id"]


def test_suggested_contract_self_validates(spark):
    df = _tbl(spark)
    d, unique = suggest_contract(df, exact_distinct=True)
    assert unique == ["event_id"]
    contract = contract_from_dict(d)
    verdicts = contract_verdicts(df, contract).collect()
    assert verdicts, "expected structural+data verdict rows"
    assert all(r["verdict"] == "pass" for r in verdicts), [
        (r["column"], r["rule"]) for r in verdicts if r["verdict"] != "pass"
    ]


def test_comma_valued_set_is_skipped(spark):
    df = spark.range(10).select(
        F.lit("a,b").alias("weird"), F.lit("ok").alias("fine")
    )
    sug = {(r["column"], r["rule"]) for r in suggest_rules(df).collect()}
    assert ("weird", "allowed") not in sug
    assert ("fine", "allowed") in sug


def test_sketched_unique_gate_uses_error_band(spark):
    # 10k distinct ids through the approx sketch: still flagged unique
    df = spark.range(10_000).select(F.col("id").alias("k"))
    sug = {(r["column"], r["rule"]) for r in suggest_rules(df).collect()}
    assert ("k", "unique_candidate") in sug


def test_ultra_rare_null_not_marked_not_null(spark):
    """1 null in 10k rows: the 6dp-rounded rate stays nonzero here, but
    the gate must use the exact count and the budget must floor at
    1e-6 — the suggested contract may never fail on its own table."""
    df = spark.range(10_000).select(
        F.when(F.col("id") == 7, None).otherwise(F.col("id")).alias("v")
    )
    sug = {
        (r["column"], r["rule"]): r for r in suggest_rules(df).collect()
    }
    assert ("v", "not_null") not in sug
    budget = sug[("v", "max_null_rate")]["num_value"]
    assert budget >= 1e-6
    assert budget >= 1.0 / 10_000  # actual rate fits the budget


def test_unique_gate_is_null_aware(spark):
    """Uniqueness candidates are judged over NON-NULL values (Deequ
    isUnique): a column unique among non-nulls with a few NULLs is
    still flagged (the null budget is its own independent rule), and
    an all-NULL column never is."""
    df = spark.range(500).select(
        F.when(F.col("id") % 100 == 0, None)
        .otherwise(F.col("id"))
        .alias("mostly_id"),
        F.lit(None).cast("long").alias("all_null"),
    )
    rules = {
        (r["column"], r["rule"])
        for r in suggest_rules(df, exact_distinct=True).collect()
    }
    assert ("mostly_id", "unique_candidate") in rules
    assert ("mostly_id", "max_null_rate") in rules  # independent rule
    assert ("all_null", "unique_candidate") not in rules
