"""Planted-fixture tests for the round-4k analytics queries:
iqr_outliers (Tukey fences) and trend_slopes (exact-integer least
squares)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _events(spark, rows, tmp_path):
    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h), u, k, v)
            for i, (h, u, k, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    ).withColumn("props", F.lit(None).cast("string"))
    df.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_iqr_outliers_planted(spark, tmp_path):
    # type A: values 1..8 plus one obvious outlier 1000.
    # quartiles of [1..8, 1000] (R-7): q1 = 3, q3 = 7 -> iqr 4,
    # fences [-3, 13] -> exactly one outlier.
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 1000.0]
    rows = [(i, 1, "A", v) for i, v in enumerate(vals)]
    sf = _events(spark, rows, tmp_path)
    from anomalydetection_spark.queries import q_iqr_outliers

    got = q_iqr_outliers(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.q1, r.q3, r.lo, r.hi) == (3.0, 7.0, -3.0, 13.0)
    assert r.n_outliers == 1
    assert abs(r.outlier_rate - 1 / 9) < 1e-6


def test_trend_slopes_planted(spark, tmp_path):
    # type UP: counts 1,2,3,4 in hours 0..3 -> perfect slope 1, r2 1.
    # type FLAT: constant counts -> dropped (zero y-variance).
    rows = []
    for h in range(4):
        rows += [(h, u, "UP", 0.0) for u in range(h + 1)]
        rows += [(h, 9, "FLAT", 0.0), (h, 10, "FLAT", 0.0)]
    sf = _events(spark, rows, tmp_path)
    from anomalydetection_spark.queries import q_trend_slopes

    got = {r.event_type: r for r in q_trend_slopes(spark, sf).collect()}
    assert set(got) == {"UP"}
    assert got["UP"].n_buckets == 4
    assert got["UP"].slope_per_hour == 1.0
    assert got["UP"].r2 == 1.0


def test_trend_slopes_gap_recentred(spark, tmp_path):
    # hour indexes recenter per type: a type whose first bucket is hour
    # 100 must get the same slope as one starting at hour 0
    rows = []
    for h in range(4):
        rows += [(h, u, "A", 0.0) for u in range(2 * h + 1)]
        rows += [(100 + h, u, "B", 0.0) for u in range(2 * h + 1)]
    sf = _events(spark, rows, tmp_path)
    from anomalydetection_spark.queries import q_trend_slopes

    got = {r.event_type: r for r in q_trend_slopes(spark, sf).collect()}
    assert got["A"].slope_per_hour == got["B"].slope_per_hour == 2.0
