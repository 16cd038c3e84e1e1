"""As-of join operator (operators/asof.py) vs hand-known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.asof import asof_join


def _tables(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t10"), (1, 20, "t20"), (2, 15, "t15"), (3, 7, "t7")],
        "uid long, t long, tag string",
    )
    quotes = spark.createDataFrame(
        [(1, 5, 100.0), (1, 10, 110.0), (1, 18, 120.0), (2, 99, 130.0)],
        "uid long, t long, px double",
    )
    return trades, quotes


def test_asof_semantics_inclusive_and_unmatched(spark):
    trades, quotes = _tables(spark)
    out = {
        (r.uid, r.t): (r.px_asof, r.t_asof)
        for r in asof_join(
            trades, quotes, "uid", "t", "t", ["px"]
        ).collect()
    }
    assert out[(1, 10)] == (110.0, 10)   # tie at t=10 matches inclusively
    assert out[(1, 20)] == (120.0, 18)   # latest at-or-before
    assert out[(2, 15)] == (None, None)  # only future quote → unmatched
    assert out[(3, 7)] == (None, None)   # key absent on right


def test_asof_left_columns_survive_and_one_row_per_left(spark):
    trades, quotes = _tables(spark)
    out = asof_join(trades, quotes, "uid", "t", "t", ["px"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"uid", "t", "tag", "px_asof", "t_asof"}


def test_asof_single_shuffle_plan(spark):
    """The union-sort-fill plan must cost exactly one hash exchange on
    the key — that is the operator's whole reason to exist."""
    trades, quotes = _tables(spark)
    plan = (
        asof_join(trades, quotes, "uid", "t", "t", ["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning") == 1
