"""operators/repair.py: imputation planning + application semantics on
planted fixtures (oracle parity for the repair_plan /
repaired_conformance catalog queries runs in tools/check_oracles.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from anomalydetection_spark.operators.repair import (
    RepairRule,
    apply_repairs,
    plan_repairs,
)


def _df(spark):
    # 10 rows: x numeric (2 nulls), s categorical (3 nulls, mode 'a'),
    # mostly_null numeric (8 nulls -> refused), clean numeric (0 nulls)
    rows = [
        (1.0, "a", None, 1),
        (2.0, "a", None, 2),
        (3.0, "a", None, 3),
        (4.0, "b", None, 4),
        (5.0, "b", None, 5),
        (6.0, "c", None, 6),
        (7.0, "d", None, 7),
        (None, None, None, 8),
        (None, None, 1.0, 9),
        (100.0, None, 2.0, 10),
    ]
    return spark.createDataFrame(
        rows, "x double, s string, mostly_null double, clean long"
    )


def test_plan_strategies_and_refusal(spark):
    rules = {r.column: r for r in plan_repairs(_df(spark))}
    # clean column has no nulls -> omitted
    assert "clean" not in rules
    x = rules["x"]
    assert x.strategy == "fill_median"
    # median of [1..7, 100] = 4.5 (interpolated)
    assert x.fill_value == "4.5"
    assert x.n_null == 2 and x.null_rate == 0.2 and x.confidence == 1.0
    s = rules["s"]
    assert s.strategy == "fill_mode"
    assert s.fill_value == "a"  # 3 of 7 non-null
    assert s.n_null == 3
    assert s.confidence == round(3 / 7, 6)
    m = rules["mostly_null"]
    assert m.strategy == "refuse" and m.fill_value == ""


def test_mode_tie_breaks_lexicographically(spark):
    df = spark.createDataFrame(
        [("b",), ("b",), ("a",), ("a",), (None,)], "s string"
    )
    (rule,) = plan_repairs(df)
    assert rule.fill_value == "a"  # 2-2 tie -> lexicographic


def test_apply_fills_tags_and_skips_refused(spark):
    df = _df(spark)
    rules = plan_repairs(df)
    rep = apply_repairs(df, rules)
    got = rep.orderBy("clean").collect()
    # row 8: x and s were null -> both filled, both tagged
    r8 = got[7]
    assert r8["x"] == 4.5 and r8["s"] == "a"
    assert sorted(r8["__repaired"]) == ["s", "x"]
    # refused column untouched (still null on row 1)
    assert got[0]["mostly_null"] is None
    assert "mostly_null" not in set(
        t for r in got for t in r["__repaired"]
    )
    # untouched rows carry an empty lineage array
    assert got[0]["__repaired"] == []
    # no nulls remain in repaired columns
    assert rep.filter(F.col("x").isNull() | F.col("s").isNull()).count() == 0
    # conservation: tagged cells == planted nulls in planned columns
    assert rep.agg(
        F.sum(F.size("__repaired"))
    ).collect()[0][0] == 5  # 2 x-nulls + 3 s-nulls


def test_integral_median_fill_casts_to_column_type(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (None,)], "k long"
    )
    rules = plan_repairs(df)
    assert rules[0].fill_value == "2.5"  # interpolated median
    rep = apply_repairs(df, rules)
    filled = rep.filter(F.size("__repaired") > 0).collect()[0]
    # cast double->long truncates toward zero: the pinned contract
    assert filled["k"] == 2
    assert rep.schema["k"].dataType.typeName() == "long"


def test_apply_with_no_rules_adds_empty_lineage(spark):
    df = spark.createDataFrame([(1,)], "k long")
    rep = apply_repairs(df, [])
    assert rep.collect()[0]["__repaired"] == []


def test_rule_roundtrip_is_plain_data():
    r = RepairRule("c", "fill_mode", "v", 1, 0.1, 0.9)
    assert (r.column, r.strategy, r.fill_value) == ("c", "fill_mode", "v")
