"""Round-4q: count-min sketch as a mergeable DataFrame relation
(functions/cms.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.functions.cms import (
    cms_build,
    cms_estimate,
    cms_merge,
)

W, D = 64, 4  # narrow width so collisions are guaranteed


def _vals(spark, values):
    return spark.createDataFrame([(v,) for v in values], "v string")


def test_one_sided_error_over_every_key(spark):
    values = [f"k{i % 37}" for i in range(1000)] + ["hot"] * 200
    df = _vals(spark, values)
    sketch = cms_build(df, "v", width=W, depth=D)
    keys = df.select("v").distinct()
    est = {
        r["key"]: r["cms_estimate"]
        for r in cms_estimate(sketch, keys, "v", width=W, depth=D).collect()
    }
    exact = {}
    for v in values:
        exact[v] = exact.get(v, 0) + 1
    n = len(values)
    for k, e in exact.items():
        assert est[k] >= e, k  # never underestimates
        # standard CM bound with margin: overshoot < 2*e*N/W
        assert est[k] <= e + 2 * 2.718 * n / W, k


def test_merge_equals_whole(spark):
    values = [f"v{i % 11}" for i in range(400)]
    half1, half2 = values[:150], values[150:]
    whole = cms_build(_vals(spark, values), "v", width=W, depth=D)
    merged = cms_merge(
        cms_build(_vals(spark, half1), "v", width=W, depth=D),
        cms_build(_vals(spark, half2), "v", width=W, depth=D),
    )
    tup = lambda df: {
        (r["d"], r["b"]): r["c"] for r in df.collect()
    }
    assert tup(whole) == tup(merged)


def test_absent_key_estimates_small(spark):
    df = _vals(spark, ["a"] * 50 + ["b"] * 30)
    sketch = cms_build(df, "v", width=W, depth=D)
    keys = _vals(spark, ["never-seen"])
    est = cms_estimate(sketch, keys, "v", width=W, depth=D).collect()[0]
    # min over 4 independent rows of a 2-key sketch: almost surely 0,
    # and never above the total mass
    assert 0 <= est["cms_estimate"] <= 80


def test_sketch_size_independent_of_input(spark):
    big = _vals(spark, [f"x{i}" for i in range(5000)])
    sketch = cms_build(big, "v", width=W, depth=D)
    assert sketch.count() <= W * D
    total = sketch.groupBy("d").agg(F.sum("c").alias("s")).collect()
    assert all(r["s"] == 5000 for r in total)


def test_nulls_excluded(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",)], "v string")
    sketch = cms_build(df, "v", width=W, depth=D)
    assert (
        sketch.groupBy("d").agg(F.sum("c").alias("s")).collect()[0]["s"] == 2
    )
