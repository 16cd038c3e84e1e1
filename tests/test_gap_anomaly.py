"""Planted-fixture tests for q_gap_anomaly (per-user adaptive
3-sigma inter-arrival gap audit, exact-integer contract)."""

from __future__ import annotations

import datetime as dt


def _events(spark, rows, tmp_path):
    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), u,
             "T", 0.0, "x")
            for i, (u, s) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_gap_anomaly_planted(spark, tmp_path):
    rows = []
    # user 1: 21 events at 60s cadence, then one 3600s silence.
    # gaps = [60]*20 + [3600]: mean 228.6, sigma 753.9 -> the 3600s
    # gap clears mean + 3*sigma (= 2490) and nothing else does.
    t = 0
    rows.append((1, t))
    for _ in range(20):
        t += 60
        rows.append((1, t))
    t += 3600
    rows.append((1, t))
    # user 2: perfectly regular -> sigma 0, zero anomalies.
    rows += [(2, 1000 + 30 * i) for i in range(10)]
    # user 3: single event -> no gaps, excluded from the report.
    rows.append((3, 5))
    sf = _events(spark, rows, tmp_path)
    from anomalydetection_spark.queries import q_gap_anomaly

    got = {r.user_id: r for r in q_gap_anomaly(spark, sf).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1.n_gaps, r1.max_gap_s, r1.n_anomalous) == (21, 3600, 1)
    assert abs(r1.mean_gap_s - 4800 / 21) < 1e-6
    r2 = got[2]
    assert (r2.n_gaps, r2.max_gap_s, r2.n_anomalous) == (9, 30, 0)


def test_gap_anomaly_two_gaps_never_anomalous(spark, tmp_path):
    # with exactly two unequal gaps the larger one sits at
    # (g - mean)^2 = (d/2)^2 < 9*sigma^2 = 9*(d/2)^2 -> never flagged
    # (the adaptive rule needs history, unlike a fixed threshold).
    rows = [(7, 0), (7, 10), (7, 1000)]
    sf = _events(spark, rows, tmp_path)
    from anomalydetection_spark.queries import q_gap_anomaly

    got = q_gap_anomaly(spark, sf).collect()
    assert len(got) == 1 and got[0].n_anomalous == 0
