"""Driver-contract smoke: entry() runs with a stable schema; every
queries() entry executes at sf0.001 and returns rows; HLL approximate
distinct is close to exact (SURVEY.md §5 item 6 runs the full oracle
cross-check via tools/check_oracles.py — this is the fast in-suite
layer)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present"
)


def test_entry_runs(spark):
    from __spark_entry__ import entry

    df = entry(spark)
    rows = df.collect()
    assert [f.name for f in df.schema.fields] == [
        "check", "n_violations", "verdict",
    ]
    assert len(rows) == 4
    assert all(r.verdict in ("pass", "fail") for r in rows)


def test_every_query_executes(spark):
    from __spark_entry__ import oracle_sql, queries

    qs = queries()
    oracles = oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, SF)
        n = df.count()
        assert n >= 0, name
        assert df.schema.fields, name


def test_hll_close_to_exact(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    approx = {
        r.event_type: r.approx_users
        for r in ev.groupBy("event_type").agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias(
                "approx_users"
            )
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(
            F.countDistinct("user_id").alias("n")
        ).collect()
    }
    for k, e in exact.items():
        assert abs(approx[k] - e) / max(e, 1) < 0.05


def test_span_roundtrip_invariant_holds_and_detects_corruption(spark):
    """q_span_roundtrip must certify every doc (ok == n_docs), and the
    certification must actually discriminate: reassembling WITHOUT the
    position sort over a multi-partition scatter is the bug class the
    invariant exists to catch, and to_json equality flags it."""
    from anomalydetection_spark.queries import q_span_roundtrip

    rows = q_span_roundtrip(spark, SF).collect()
    assert rows
    assert all(r.n_roundtrip_ok == r.n_docs for r in rows)

    # negative control: shuffled spans, no ordered reassembly
    docs = spark.createDataFrame(
        [(1, [("text", "a", None, 0), ("image", "b", "m1", 10),
              ("text", "c", None, 20)])],
        "doc_id long, spans array<struct<kind:string,text:string,"
        "media_ref:string,offset:int>>",
    )
    broken = docs.select(
        "doc_id",
        F.reverse("spans").alias("rebuilt"),
        F.col("spans"),
    ).select(
        (F.to_json("spans") == F.to_json("rebuilt")).alias("ok")
    )
    assert broken.first().ok is False


def test_event_funnel_monotone_and_ordered(spark):
    """Funnel counts must be monotone non-increasing (stage k requires a
    strictly-later stage-(k-1) hit), and a planted user whose purchase
    precedes every click must NOT count at stage 3."""
    from anomalydetection_spark.queries import q_event_funnel

    rows = q_event_funnel(spark, SF).orderBy("stage").collect()
    assert [r["stage_name"] for r in rows] == ["view", "click", "purchase"]
    ns = [r["n_reached"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2] >= 0
    assert all(
        r["conv_from_prev"] is None or 0.0 <= r["conv_from_prev"] <= 1.0
        for r in rows
    )

    # planted ordering violation: purchase BEFORE any click -> stage 2 max
    import pyspark.sql.functions as SF_

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, "view", 0.0, ""),
            (2, "2024-01-01 00:00:01", 7, "purchase", 0.0, ""),
            (3, "2024-01-01 00:00:02", 7, "click", 0.0, ""),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", SF_.to_timestamp("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = {
            r["stage_name"]: r["n_reached"]
            for r in q_event_funnel(spark, d).collect()
        }
    assert out == {"view": 1, "click": 1, "purchase": 0}


def test_cohort_retention_offset0_is_full(spark):
    """Offset 0 is the cohort week itself: retention must be 1.0 for
    every cohort, and all retentions lie in (0, 1]."""
    from anomalydetection_spark.queries import q_cohort_retention

    rows = q_cohort_retention(spark, SF).collect()
    assert rows
    for r in rows:
        assert 0.0 < r["retention"] <= 1.0
        if r["week_offset"] == 0:
            assert r["retention"] == 1.0
        assert r["week_offset"] >= 0


def test_seasonal_anomaly_flags_planted_spike(spark):
    """A 10x count spike in one hour must be flagged against its
    hour-of-day baseline; quiet hours must not be."""
    import tempfile

    import pyspark.sql.functions as SF_
    from anomalydetection_spark.queries import q_seasonal_anomaly

    rows = []
    eid = 0
    # 20 days of a flat 5-events-per-day profile at hour 09 (a spike
    # inside its own n-point baseline has z <= (n-1)/sqrt(n), so 10
    # days could never cross 3 sigma; 20 days caps at ~4.25) ...
    for day in range(1, 21):
        n = 50 if day == 7 else 5  # ... with a day-7 spike
        for i in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{day:02d} 09:00:{i % 60:02d}",
                         1, "click", 0.0, ""))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", SF_.to_timestamp_ntz("ts"))
    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = q_seasonal_anomaly(spark, d).collect()
    flagged = {r["bucket_ts"].day for r in out if r["is_anomaly"]}
    assert flagged == {7}
    assert len(out) == 20


def test_fd_violations_key_fd_holds(spark):
    """A key FD must hold with rate 0; non-FDs must report a rate in
    (0, 1]; rates and counts are internally consistent."""
    from anomalydetection_spark.queries import q_fd_violations

    rows = {r["fd"]: r for r in q_fd_violations(spark, SF).collect()}
    assert rows["p_partkey->p_brand"]["holds"] is True
    assert rows["p_partkey->p_brand"]["violation_rate"] == 0.0
    for name, r in rows.items():
        assert (r["n_violating"] == 0) == r["holds"]
        assert 0 <= r["n_violating"] <= r["n_lhs"]


def test_benford_covers_all_digits_and_sums_to_one(spark):
    from anomalydetection_spark.queries import q_benford_deviation

    rows = q_benford_deviation(spark, SF).collect()
    assert sorted(r["digit"] for r in rows) == list(range(1, 10))
    assert abs(sum(r["p_obs"] for r in rows) - 1.0) < 1e-4
    assert abs(sum(r["p_benford"] for r in rows) - 1.0) < 1e-4


def test_numeric_correlations_bounded_and_complete(spark):
    from anomalydetection_spark.queries import q_numeric_correlations

    rows = q_numeric_correlations(spark, SF).collect()
    assert len(rows) == 6
    assert len({(r["col_a"], r["col_b"]) for r in rows}) == 6
    for r in rows:
        assert r["pearson_r"] is None or -1.0 <= r["pearson_r"] <= 1.0


def test_benford_subunit_prices_do_not_crash(spark):
    """Prices in (0,1) have first significant char '0'; the digit guard
    must drop them without an ANSI divide-by-zero."""
    import tempfile

    from anomalydetection_spark.queries import q_benford_deviation

    li = spark.createDataFrame(
        [(1, 0.5), (2, 12.0), (3, 905.0), (4, 0.07)],
        "l_orderkey long, l_extendedprice double",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(f"{d}/lineitem.parquet")
        rows = q_benford_deviation(spark, d).collect()
    assert sorted(r["digit"] for r in rows) == [1, 9]
    assert abs(sum(r["p_obs"] for r in rows) - 1.0) < 1e-9


def test_day_coverage_detects_planted_gap(spark, tmp_path):
    """A type that skips two days inside the span reports n_missing=2
    and verdict 'gaps'; full-coverage types stay 'complete'."""
    import pyspark.sql.functions as F

    from anomalydetection_spark.queries import q_day_coverage

    ev = spark.range(1000).select(
        F.col("id").alias("event_id"),
        F.element_at(
            F.array(F.lit("a"), F.lit("b")), (F.col("id") % 2 + 1).cast("int")
        ).alias("event_type"),
        F.to_timestamp(
            F.concat(
                F.lit("2026-01-"),
                F.format_string("%02d", ((F.col("id") / 2).cast("long") % 10) + 1),
                F.lit(" 12:00:00"),
            )
        ).alias("ts"),
        F.lit(0).alias("user_id"),
        F.lit(0.0).alias("value"),
        F.lit("{}").alias("props"),
    ).filter(
        # type 'b' loses days 4 and 7 entirely
        ~((F.col("event_type") == "b") & F.dayofmonth("ts").isin(4, 7))
    )
    d = str(tmp_path / "sf")
    ev.write.mode("overwrite").parquet(d + "/events.parquet")
    rows = {r["event_type"]: r for r in q_day_coverage(spark, d).collect()}
    assert rows["a"]["verdict"] == "complete"
    assert rows["a"]["n_missing"] == 0
    assert rows["b"]["verdict"] == "gaps"
    assert rows["b"]["n_missing"] == 2
    assert rows["b"]["n_expected"] == 10


def test_distinctness_profile_ratio_algebra(spark):
    """n_once <= n_distinct <= n_values; uniqueness = n_once/n_values;
    event_id (a key) has distinctness 1.0; event_day is low-cardinality."""
    from anomalydetection_spark.queries import QUERIES

    rows = {r["col"]: r for r in QUERIES["distinctness_profile"](spark, SF).collect()}
    assert set(rows) == {"event_id", "user_id", "event_type", "event_day"}
    for r in rows.values():
        assert 0 < r["n_once"] or r["n_once"] == 0
        assert r["n_once"] <= r["n_distinct"] <= r["n_values"]
        assert abs(r["uniqueness"] - round(r["n_once"] / r["n_values"], 6)) < 1e-9
        assert abs(r["distinctness"] - round(r["n_distinct"] / r["n_values"], 6)) < 1e-9
    assert rows["event_id"]["distinctness"] == 1.0
    assert rows["event_type"]["n_distinct"] < 20


def test_format_patterns_skeleton_and_shares(spark):
    """Every pattern is fully class-mapped (no residual alnum beyond the
    class letters); per-column shares of the reported patterns never
    exceed 1; props rows reduce to JSON-shaped skeletons."""
    from anomalydetection_spark.queries import QUERIES

    rows = QUERIES["format_patterns"](spark, SF).collect()
    assert rows
    import re

    for r in rows:
        assert r["n"] >= 5
        assert not re.search(r"[0-8b-zB-Z]", r["pattern"]), r["pattern"]
        # compact form never longer than the raw skeleton
        assert len(r["compact"]) <= len(r["pattern"])
    by_col: dict[str, float] = {}
    for r in rows:
        by_col[r["col"]] = by_col.get(r["col"], 0.0) + r["share"]
    for col, s in by_col.items():
        assert s <= 1.0 + 1e-6, (col, s)
    props = [r for r in rows if r["col"] == "props"]
    assert props and all(p["pattern"].startswith('{"') for p in props)


def test_partition_skew_gini_bounds_and_uniform_case(spark):
    """Engine output at sf0.001 is internally consistent (Gini in
    [0,1), skew_ratio >= 1, counts conserve); a hand-built perfectly
    uniform grid yields Gini ~ (via the rank formula) the known
    closed form and skew_ratio exactly 1."""
    from anomalydetection_spark.queries import QUERIES

    r = QUERIES["partition_skew"](spark, SF).collect()[0]
    assert r["n_partitions"] >= 1
    assert r["max_rows"] <= r["n_rows"]
    assert r["skew_ratio"] >= 1.0
    assert 0.0 <= r["gini"] < 1.0
    assert abs(r["mean_rows"] * r["n_partitions"] - r["n_rows"]) < 1.0

    # closed form: equal sizes -> sum(i*n) = n*k(k+1)/2 -> gini 0
    import tempfile

    from anomalydetection_spark.queries import QUERIES as Q

    with tempfile.TemporaryDirectory() as td:
        uniform = spark.createDataFrame(
            [(f"s{i}", "en", j) for i in range(4) for j in range(10)],
            "source string, lang string, doc_id long",
        )
        uniform.write.mode("overwrite").parquet(f"{td}/documents.parquet")
        u = Q["partition_skew"](spark, td).collect()[0]
        assert u["gini"] == 0.0 and u["skew_ratio"] == 1.0 and u["cv"] == 0.0
