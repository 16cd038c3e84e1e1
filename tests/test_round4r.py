"""Planted-fixture semantics for the round-4r batch: CFD conformance,
deterministic exact-k sampling, completeness grid, calendar volume
anomaly, pairwise source drift, sequence support, detector consensus.
(Oracle parity for all seven runs in tools/check_oracles.py — these
tests pin the BEHAVIOR on constructed inputs.)"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from anomalydetection_spark.queries import (
    q_anomaly_consensus,
    q_cfd_conformance,
    q_completeness_grid,
    q_reservoir_sample,
    q_sequence_support,
    q_source_drift_matrix,
    q_volume_anomaly,
)

SF = "/root/testdata/sf0.001"


def _write(df, tmp_path, name):
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/{name}.parquet")
    return d


def _events(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type, value, props)."""
    return spark.createDataFrame(
        [
            (eid, ts, uid, et, v, p)
            for eid, ts, uid, et, v, p in rows
        ],
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


def test_cfd_holds_and_breaks(spark, tmp_path):
    """A perfect conditional FD reports confidence 1.0 / holds; a 50/50
    split under the condition reports 0.5 / broken; majority value and
    counts are exact."""
    li = spark.createDataFrame(
        # R -> always F (perfect); N -> half O half F (broken)
        [("R", "F")] * 10 + [("N", "O")] * 5 + [("N", "F")] * 5
        # the third rule (status F -> returnflag) sees 10 R + 5 N
        ,
        "l_returnflag string, l_linestatus string",
    )
    d = _write(li, tmp_path, "lineitem")
    rows = {r["rule"]: r for r in q_cfd_conformance(spark, d).collect()}
    assert rows["ret_R_status"]["majority_rhs"] == "F"
    assert rows["ret_R_status"]["confidence"] == 1.0
    assert rows["ret_R_status"]["holds"] is True
    assert rows["ret_N_status"]["n_cond"] == 10
    assert rows["ret_N_status"]["confidence"] == 0.5
    assert rows["ret_N_status"]["holds"] is False
    # ties break lexicographically: F vs O at 5/5 -> F
    assert rows["ret_N_status"]["majority_rhs"] == "F"
    assert rows["status_F_ret"]["n_cond"] == 15
    assert rows["status_F_ret"]["majority_rhs"] == "R"


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata absent")
def test_reservoir_sample_exact_k_and_deterministic(spark):
    """Every stratum yields min(k, |stratum|) rows with dense ranks
    1..k, and two independent runs return the identical id set (the
    property a random() reservoir lacks)."""
    out = q_reservoir_sample(spark, SF)
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    sizes = {
        r["source"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for s, n in per.items():
        assert n == min(50, sizes[s])
    ranks = out.groupBy("source").agg(
        F.max("rk").alias("mx"), F.count("*").alias("n")
    )
    assert all(r["mx"] == r["n"] for r in ranks.collect())
    a = sorted((r["source"], r["doc_id"]) for r in out.collect())
    b = sorted(
        (r["source"], r["doc_id"]) for r in q_reservoir_sample(spark, SF).collect()
    )
    assert a == b


def test_completeness_grid_planted_nulls(spark, tmp_path):
    """Day 1: 2/4 user_ids null -> 0.5; day 2 fully complete -> 1.0;
    value nulls only on day 2 -> 0.75."""
    rows = [
        (1, "2026-01-01 01:00:00", None, "a", 1.0, "{}"),
        (2, "2026-01-01 02:00:00", None, "a", 2.0, "{}"),
        (3, "2026-01-01 03:00:00", 7, "a", 3.0, "{}"),
        (4, "2026-01-01 04:00:00", 8, "a", 4.0, "{}"),
        (5, "2026-01-02 01:00:00", 1, "b", None, "{}"),
        (6, "2026-01-02 02:00:00", 2, "b", 1.0, "{}"),
        (7, "2026-01-02 03:00:00", 3, "b", 2.0, "{}"),
        (8, "2026-01-02 04:00:00", 4, "b", 3.0, "{}"),
    ]
    d = _write(_events(spark, rows), tmp_path, "events")
    out = {
        (r["day"], r["col"]): r
        for r in q_completeness_grid(spark, d).collect()
    }
    assert out[("2026-01-01", "user_id")]["completeness"] == 0.5
    assert out[("2026-01-01", "user_id")]["n_null"] == 2
    assert out[("2026-01-02", "user_id")]["completeness"] == 1.0
    assert out[("2026-01-02", "value")]["completeness"] == 0.75
    assert out[("2026-01-01", "props")]["completeness"] == 1.0
    assert len(out) == 8  # 2 days x 4 columns


def test_volume_anomaly_flags_same_weekday_spike(spark, tmp_path):
    """Five calm Mondays at ~100 rows plus one 10x Monday: only the
    spike Monday flags; its dow is 0 (1970-01-05 anchor is a Monday).
    Tuesdays with a different but internally-calm level never flag —
    the calendar profile, not a global band, is the contract."""
    mondays = ["2026-01-05", "2026-01-12", "2026-01-19", "2026-01-26",
               "2026-02-02", "2026-02-09"]
    tuesdays = ["2026-01-06", "2026-01-13", "2026-01-20", "2026-01-27",
                "2026-02-03"]
    rows, eid = [], 0
    for i, day in enumerate(mondays):
        n = 1000 if i == 5 else 100 + i  # slight jitter, then a 10x spike
        for j in range(n):
            rows.append((eid, f"{day} 06:00:00", 1, "a", 0.0, "{}"))
            eid += 1
    for i, day in enumerate(tuesdays):
        for j in range(500 + i):  # different level, calm
            rows.append((eid, f"{day} 06:00:00", 1, "a", 0.0, "{}"))
            eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    out = {r["day"]: r for r in q_volume_anomaly(spark, d).collect()}
    assert all(out[m]["dow"] == 0 for m in mondays)
    assert all(out[t]["dow"] == 1 for t in tuesdays)
    assert out["2026-02-09"]["is_anomaly"] is True
    assert not any(
        out[day]["is_anomaly"] for day in mondays[:5] + tuesdays
    )


def test_source_drift_matrix_identical_vs_shifted(spark, tmp_path):
    """Two sources with identical length distributions sit at psi~0
    ('ok'); a third source shifted into different buckets scores
    higher against both; only a<b pairs appear."""
    docs = []
    i = 0
    for src, base in (("s1", 100), ("s2", 100), ("s3", 3000)):
        for j in range(200):
            docs.append((i, "x", "en", src, base + j))
            i += 1
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    out = {
        (r["source_a"], r["source_b"]): r
        for r in q_source_drift_matrix(spark, d).collect()
    }
    assert set(out) == {("s1", "s2"), ("s1", "s3"), ("s2", "s3")}
    assert abs(out[("s1", "s2")]["psi"]) < 1e-9
    assert out[("s1", "s2")]["verdict"] == "ok"
    assert out[("s1", "s3")]["psi"] > 0.25
    assert out[("s1", "s3")]["verdict"] == "drift"


def test_sequence_support_counts_contiguous_trigrams(spark, tmp_path):
    """Two users each emit a>b>c>d: trigrams a>b>c and b>c>d appear
    twice each; a 2-event user contributes nothing; ties rank
    lexicographically."""
    rows = []
    eid = 0
    for uid in (1, 2):
        for i, et in enumerate("abcd"):
            rows.append(
                (eid, f"2026-01-01 0{i + 1}:00:00", uid, et, 0.0, "{}")
            )
            eid += 1
    rows.append((eid, "2026-01-01 01:00:00", 3, "a", 0.0, "{}"))
    rows.append((eid + 1, "2026-01-01 02:00:00", 3, "b", 0.0, "{}"))
    d = _write(_events(spark, rows), tmp_path, "events")
    out = q_sequence_support(spark, d).collect()
    assert [(r["trigram"], r["n"], r["rk"]) for r in out] == [
        ("a>b>c", 2, 1),
        ("b>c>d", 2, 2),
    ]
    assert all(r["share"] == 0.5 for r in out)


def test_anomaly_consensus_spike_gets_all_votes(spark, tmp_path):
    """30 calm days at ~100 rows plus one 20x day: the spike collects
    all three votes (consensus), calm days collect none. Detector
    columns stay individually visible for triage."""
    rows, eid = [], 0
    for day in range(1, 31):
        n = 2000 if day == 25 else 100 + (day % 3)
        for j in range(n):
            rows.append(
                (eid, f"2026-01-{day:02d} 06:00:00", 1, "a", 0.0, "{}")
            )
            eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    out = {r["day"]: r for r in q_anomaly_consensus(spark, d).collect()}
    spike = out["2026-01-25"]
    assert spike["votes"] == 3 and spike["consensus"] is True
    assert spike["rz_flag"] and spike["iqr_flag"] and spike["ema_flag"]
    calm = [r for day, r in out.items() if day != "2026-01-25"]
    assert all(r["consensus"] is False for r in calm)
    assert sum(r["votes"] for r in calm) <= 2  # at most stray single votes


# round 4s ------------------------------------------------------------------

def test_rolling_distinct_window_union(spark, tmp_path):
    """10 users on day 1, 10 fresh users on day 5: day 5's 7-day window
    holds 20 distinct; day 8+ (window slides past day 1) drops back to
    10; sketch estimate certifies within 5%."""
    rows, eid = [], 0
    for day, base in ((1, 0), (5, 100)):
        for u in range(10):
            rows.append(
                (eid, f"2026-01-{day:02d} 01:00:00", base + u, "a", 0.0, "{}")
            )
            eid += 1
    # keep every day present so the day grid is dense
    for day in range(1, 11):
        rows.append((eid, f"2026-01-{day:02d} 02:00:00", 0, "a", 0.0, "{}"))
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_rolling_distinct

    out = {r["day"]: r for r in q_rolling_distinct(spark, d).collect()}
    assert out["2026-01-01"]["n_exact"] == 10  # users 0..9 (0 overlaps)
    assert out["2026-01-05"]["n_exact"] == 20  # both cohorts + user 0
    assert out["2026-01-07"]["n_exact"] == 20  # day 1 still in window
    assert out["2026-01-08"]["n_exact"] == 11  # day 1 slid out
    assert all(r["within_5pct"] for r in out.values())


def test_histogram_quantiles_lower_weighted_semantics(spark, tmp_path):
    """Values 1..100 once each: lower weighted quantile picks bucket
    ceil(q*n) exactly — p50=50, p90=90, p99=99; a heavy repeated value
    pulls every quantile onto itself."""
    rows = [
        (i, "2026-01-01 01:00:00", 1, "a", float(i % 100 + 1), "{}")
        for i in range(100)
    ]
    rows += [
        (1000 + i, "2026-01-01 01:00:00", 1, "b", 7.0, "{}")
        for i in range(100)
    ]
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_histogram_quantiles

    out = {r["event_type"]: r for r in q_histogram_quantiles(spark, d).collect()}
    assert (out["a"]["p50"], out["a"]["p90"], out["a"]["p99"]) == (
        50.0, 90.0, 99.0,
    )
    assert (out["b"]["p50"], out["b"]["p90"], out["b"]["p99"]) == (
        7.0, 7.0, 7.0,
    )


def test_dqi_scorecard_grades_and_null_aware_uniqueness(spark, tmp_path):
    """A clean source grades A at dqi 1.0; a source with short texts,
    an out-of-set lang, and duplicate ids is scored down on exactly
    the right components."""
    docs = []
    for i in range(10):  # clean source
        docs.append((i, "x" * 200, "en", "good", 200))
    for i in range(10):  # half short, two dup ids, one bad lang
        docs.append(
            (
                100 + (i % 8),  # 8 distinct ids over 10 rows
                "x" * (50 if i < 5 else 200),
                "xx" if i == 0 else "en",
                "bad",
                50 if i < 5 else 200,
            )
        )
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_dqi_scorecard

    out = {r["source"]: r for r in q_dqi_scorecard(spark, d).collect()}
    assert out["good"]["dqi"] == 1.0 and out["good"]["grade"] == "A"
    b = out["bad"]
    assert b["completeness"] == 0.5
    assert b["validity"] == 0.9
    assert b["uniqueness"] == 0.8
    assert b["dqi"] == round(0.4 * 0.5 + 0.3 * 0.9 + 0.3 * 0.8, 6)
    assert b["grade"] == "C"


# round 4t ------------------------------------------------------------------

def test_psi_timeline_flags_the_moved_week(spark, tmp_path):
    """Three weeks of a low-value distribution, then a week shifted
    into high buckets: only the transition week drifts; the stable
    week-over-week pairs stay ok. Weeks are Monday-anchored indexes."""
    rows, eid = [], 0
    # weeks of 2026-01: Mon 5th, 12th, 19th, 26th
    for wstart, lo in (("05", True), ("12", True), ("19", True), ("26", False)):
        for j in range(200):
            v = float(10 + j % 30) if lo else float(400 + j % 30)
            rows.append(
                (eid, f"2026-01-{wstart} 06:00:00", 1, "a", v, "{}")
            )
            eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_psi_timeline

    out = {r["week"]: r for r in q_psi_timeline(spark, d).collect()}
    weeks = sorted(out)
    assert len(weeks) == 3  # three consecutive-week comparisons
    assert out[weeks[0]]["verdict"] == "ok"
    assert out[weeks[1]]["verdict"] == "ok"
    assert out[weeks[2]]["verdict"] == "drift"
    assert out[weeks[2]]["psi"] > out[weeks[0]]["psi"]


def test_theil_sen_ignores_single_wild_day(spark, tmp_path):
    """A clean +10/day ramp keeps slope 10 even with one 20x outlier
    day in the middle (least squares would be dragged); a flat series
    reads 'flat'."""
    rows, eid = [], 0
    for day in range(1, 11):
        n = 2000 if day == 5 else 100 + 10 * day
        for j in range(n):
            rows.append((eid, f"2026-01-{day:02d} 06:00:00", 1, "ramp", 0.0, "{}"))
            eid += 1
        for j in range(50):
            rows.append((eid, f"2026-01-{day:02d} 07:00:00", 1, "flat", 0.0, "{}"))
            eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_theil_sen_trend

    out = {r["event_type"]: r for r in q_theil_sen_trend(spark, d).collect()}
    assert out["ramp"]["slope"] == 10.0
    assert out["ramp"]["direction"] == "up"
    assert out["flat"]["slope"] == 0.0
    assert out["flat"]["direction"] == "flat"
    assert out["ramp"]["n_pairs"] == 45  # C(10,2)


def test_token_budget_cumulative_order(spark, tmp_path):
    """Sources rank by token contribution; cum_share is monotone and
    ends at 1.0; blank docs contribute zero tokens."""
    docs = []
    i = 0
    for src, words, ndocs in (("big", 100, 10), ("mid", 10, 10), ("tiny", 1, 5)):
        for j in range(ndocs):
            docs.append((i, " ".join(["w"] * words), "en", src, 0))
            i += 1
    docs.append((i, "   ", "en", "tiny", 0))  # blank -> 0 tokens
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_token_budget

    out = sorted(q_token_budget(spark, d).collect(), key=lambda r: r["rank"])
    assert [r["source"] for r in out] == ["big", "mid", "tiny"]
    assert out[0]["n_tokens"] == 1000 and out[2]["n_tokens"] == 5
    assert out[-1]["cum_share"] == 1.0
    shares = [r["cum_share"] for r in out]
    assert shares == sorted(shares)


def test_enum_drift_added_removed_stable(spark, tmp_path):
    """A type only in the odd half reads 'added', only in the even
    half 'removed', both halves 'stable' with a finite freq_ratio;
    added/removed have NULL ratio."""
    rows = []
    eid = 0
    for _ in range(10):  # stable: both parities
        rows.append((eid, "2026-01-01 01:00:00", 1, "stable", 0.0, "{}")); eid += 1
    for _ in range(5):  # only even ids
        while eid % 2 != 0:
            eid += 1
        rows.append((eid, "2026-01-01 01:00:00", 1, "old", 0.0, "{}")); eid += 1
    for _ in range(5):  # only odd ids
        while eid % 2 != 1:
            eid += 1
        rows.append((eid, "2026-01-01 01:00:00", 1, "new", 0.0, "{}")); eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_enum_drift

    out = {r["event_type"]: r for r in q_enum_drift(spark, d).collect()}
    assert out["new"]["status"] == "added" and out["new"]["n_base"] == 0
    assert out["old"]["status"] == "removed" and out["old"]["n_curr"] == 0
    assert out["stable"]["status"] == "stable"
    assert out["new"]["freq_ratio"] is None
    assert out["old"]["freq_ratio"] is None
    assert out["stable"]["freq_ratio"] is not None


def test_spearman_detects_nonlinear_monotone(spark, tmp_path):
    """value = exp(hour) is perfectly monotone in time: rho = 1.0
    (Pearson would be well below); a value that reverses halfway
    scores near 0."""
    rows, eid = [], 0
    import math

    for h in range(1, 21):
        rows.append(
            (eid, f"2026-01-01 {h:02d}:30:00", 1, "mono",
             math.exp(h / 3.0), "{}")
        )
        eid += 1
    for h in range(1, 21):
        v = float(h if h <= 10 else 21 - h)
        rows.append(
            (eid, f"2026-01-01 {h:02d}:30:00", 1, "vee", v, "{}")
        )
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_spearman_correlation

    out = {
        r["event_type"]: r
        for r in q_spearman_correlation(spark, d).collect()
    }
    assert out["mono"]["rho"] == 1.0 and out["mono"]["is_monotone"] is True
    assert abs(out["vee"]["rho"]) < 0.3 and out["vee"]["is_monotone"] is False


# round 4u ------------------------------------------------------------------

def test_join_fanout_histogram_and_hot_tier(spark, tmp_path):
    """95 keys with 1 child + one key with 100 children: the hot key's
    fanout tier is flagged (>=10x mean rows/key), shares sum to 1."""
    rows = [(i, i, "O", 1.0, "2026-01-01", "P") for i in range(95)]
    rows += [(1000 + j, 999, "O", 1.0, "2026-01-01", "P") for j in range(100)]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    from anomalydetection_spark.queries import q_join_fanout

    out = {r["fanout"]: r for r in q_join_fanout(spark, d).collect()}
    assert out[1]["n_keys"] == 95 and out[100]["n_keys"] == 1
    assert out[100]["is_hot_tier"] is True
    assert out[1]["is_hot_tier"] is False
    assert abs(sum(r["row_share"] for r in out.values()) - 1.0) < 1e-6


def test_row_completeness_separates_failure_modes(spark, tmp_path):
    """8 rows each missing one field score 4/5; 2 rows missing three
    fields score 2/5 — the histogram separates what column-level null
    rates would average together."""
    rows = [(i, "2026-01-01 01:00:00", None, "a", 1.0, "{}")
            for i in range(8)]
    rows += [(100 + i, "2026-01-01 01:00:00", None, None, None, "{}")
             for i in range(2)]
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_row_completeness

    out = {r["n_nonnull"]: r for r in q_row_completeness(spark, d).collect()}
    assert out[4]["n_rows"] == 8 and out[4]["share"] == 0.8
    assert out[2]["n_rows"] == 2 and out[2]["share"] == 0.2


def test_persistent_anomaly_requires_consecutive_run(spark, tmp_path):
    """User 1 spikes on two CONSECUTIVE days -> persistent (max_run 2);
    user 2 spikes on two separated days -> flagged twice but NOT
    persistent; user 3 never spikes and does not appear."""
    rows, eid = [], 0
    for day in range(1, 11):
        for uid, spike_days in ((1, (5, 6)), (2, (3, 8)), (3, ())):
            n = 50 if day in spike_days else 10
            for _ in range(n):
                rows.append(
                    (eid, f"2026-01-{day:02d} 06:00:00", uid, "a", 0.0, "{}")
                )
                eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_persistent_anomaly

    out = {r["user_id"]: r for r in q_persistent_anomaly(spark, d).collect()}
    assert out[1]["max_run"] == 2 and out[1]["is_persistent"] is True
    assert out[2]["n_flagged"] == 2 and out[2]["max_run"] == 1
    assert out[2]["is_persistent"] is False
    assert 3 not in out


# plan-shape pins: the new batches keep the one-raw-shuffle discipline

def _hash_exchanges(df):
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return [
        ln
        for ln in buf.getvalue().splitlines()
        if "Exchange" in ln
        and "BroadcastExchange" not in ln
        and "hashpartitioning" in ln
    ]


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata absent")
def test_new_queries_raw_shuffle_budget(spark):
    """Each round-4r/s/t/u one-scan query hashes raw rows AT MOST
    once; everything after runs on bounded grids (single-partition
    exchanges for metadata windows are a separate, declared tier)."""
    from anomalydetection_spark.queries import (
        q_burstiness_index,
        q_charset_audit,
        q_completeness_grid,
        q_join_fanout,
        q_precision_audit,
        q_row_completeness,
        q_volume_anomaly,
    )

    # (query, max hash exchanges over RAW rows or bounded grids)
    for fn, budget in (
        (q_row_completeness, 1),   # one agg to <=6-row histogram
        (q_completeness_grid, 1),  # one agg on day
        (q_join_fanout, 2),        # key counts -> fanout histogram
        (q_volume_anomaly, 2),     # daily series -> 7-row dow agg
        (q_charset_audit, 1),      # row-local codepoint math -> grid
        (q_precision_audit, 1),    # row-local identity test -> grid
        (q_burstiness_index, 2),   # daily series -> type agg
    ):
        ex = _hash_exchanges(fn(spark, SF))
        assert len(ex) <= budget, (fn.__name__, ex)


# round 4w ------------------------------------------------------------------

def test_weighted_sample_overrepresents_heavy_docs(spark, tmp_path):
    """200 light docs (w=10) + 20 heavy docs (w=10000): the top-20
    A-ES draw is dominated by heavy docs; exactly k rows per source;
    replay is deterministic."""
    docs = [(i, "x", "en", "s", 10) for i in range(200)]
    docs += [(1000 + i, "x", "en", "s", 10000) for i in range(20)]
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_weighted_sample

    out = q_weighted_sample(spark, d).collect()
    assert len(out) == 20
    n_heavy = sum(1 for r in out if r["doc_id"] >= 1000)
    assert n_heavy >= 15  # weight-proportional, not uniform
    again = q_weighted_sample(spark, d).collect()
    assert sorted(r["doc_id"] for r in out) == sorted(
        r["doc_id"] for r in again
    )


def test_quantile_mapping_identity_and_shift(spark, tmp_path):
    """A single source maps every occupied bucket to itself; with a
    low-bucket source vs a high-bucket source, the low source's
    buckets map onto the global (mixed) scale — monotone, and its top
    cum_share reaches a global bucket >= its own."""
    docs = [(i, "x", "en", "lo", 10 + (i % 4) * 256) for i in range(100)]
    d1 = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_quantile_mapping

    ident = q_quantile_mapping(spark, d1).collect()
    assert all(r["bucket"] == r["mapped_bucket"] for r in ident)
    docs += [(2000 + i, "x", "en", "hi", 12 * 256 + (i % 4) * 256)
             for i in range(100)]
    d2 = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    out = [
        r for r in q_quantile_mapping(spark, d2).collect()
        if r["source"] == "lo"
    ]
    out.sort(key=lambda r: r["bucket"])
    mapped = [r["mapped_bucket"] for r in out]
    assert mapped == sorted(mapped)  # monotone
    # lo's last bucket covers cum_share 0.5 of the mix -> maps into
    # the global scale at or beyond its own bucket
    assert mapped[-1] >= out[-1]["bucket"]


def test_correlation_drift_detects_flipped_relation(spark, tmp_path):
    """Base half: price = 2*qty (r=1). Current half: price = -2*qty
    (r=-1). That pair drifts with abs_delta 2; discount~tax stays
    perfectly stable in both halves (delta 0)."""
    rows = []
    for i in range(200):
        qty = float(i % 50 + 1)
        even = 2 * i          # base half
        odd = 2 * i + 1       # current half
        rows.append((even, 1, 1, 1, qty, 2 * qty, 0.01 * (i % 9),
                     0.02 * (i % 9), "N", "O", "2026-01-01"))
        rows.append((odd, 1, 1, 1, qty, -2 * qty, 0.01 * (i % 9),
                     0.02 * (i % 9), "N", "O", "2026-01-01"))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    from anomalydetection_spark.queries import q_correlation_drift

    out = {
        (r["col_a"], r["col_b"]): r
        for r in q_correlation_drift(spark, d).collect()
    }
    flip = out[("l_quantity", "l_extendedprice")]
    assert flip["r_base"] == 1.0 and flip["r_curr"] == -1.0
    assert flip["abs_delta"] == 2.0 and flip["is_drifted"] is True
    stable = out[("l_discount", "l_tax")]
    assert stable["abs_delta"] == 0.0 and stable["is_drifted"] is False


def test_segmented_drift_catches_simpson_masking(spark, tmp_path):
    """Segment 'a' shifts low->high between halves, segment 'b' shifts
    high->low by the same mass: each segment drifts hard but the
    pooled distribution is unchanged — masked_by_aggregate fires for
    both; the pooled row itself stays calm."""
    rows, eid = [], 0
    for seg, lo_half in (("a", "base"), ("b", "curr")):
        for half in ("base", "curr"):
            v = 10.0 if half == lo_half else 510.0
            for _ in range(200):
                # parity encodes the half
                if half == "base":
                    while eid % 2 != 0:
                        eid += 1
                else:
                    while eid % 2 != 1:
                        eid += 1
                rows.append(
                    (eid, "2026-01-01 01:00:00", 1, seg, v, "{}")
                )
                eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_segmented_drift

    out = {r["segment"]: r for r in q_segmented_drift(spark, d).collect()}
    assert out["__all__"]["psi"] <= 0.1
    assert out["a"]["psi"] > 0.25 and out["b"]["psi"] > 0.25
    assert out["a"]["masked_by_aggregate"] is True
    assert out["b"]["masked_by_aggregate"] is True
    assert out["__all__"]["masked_by_aggregate"] is False


def test_embedding_drift_rotation_and_scale(spark, tmp_path):
    """Label 0: identical centroids across halves -> cos 1.0, ratio
    1.0, calm. Label 1: the current half is the base vector scaled
    2x -> cos 1.0 but ratio 2.0 (rescaled). Label 2: current is an
    orthogonal vector -> cos 0.0 (rotated)."""
    rows = []
    vid = 0
    for _ in range(10):
        for base, curr, label in (
            ([1.0, 0.0, 1.0, 0.0], [1.0, 0.0, 1.0, 0.0], 0),
            ([1.0, 0.0, 1.0, 0.0], [2.0, 0.0, 2.0, 0.0], 1),
            ([1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0], 2),
        ):
            while vid % 2 != 0:
                vid += 1
            rows.append((vid, base, label)); vid += 1
            while vid % 2 != 1:
                vid += 1
            rows.append((vid, curr, label)); vid += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    from anomalydetection_spark.queries import q_embedding_drift

    out = {r["label"]: r for r in q_embedding_drift(spark, d).collect()}
    assert out[0]["centroid_cosine"] == 1.0
    assert out[0]["norm_ratio"] == 1.0
    assert out[0]["is_drifted"] is False
    assert out[1]["centroid_cosine"] == 1.0
    assert out[1]["norm_ratio"] == 2.0
    assert out[1]["is_drifted"] is True
    assert out[2]["centroid_cosine"] == 0.0
    assert out[2]["is_drifted"] is True


# round 4x ------------------------------------------------------------------

def test_charset_audit_flags_mojibake(spark, tmp_path):
    """A clean ASCII source audits at ascii_share 1.0; a source with
    replacement chars and control bytes crosses the 0.1% gates."""
    docs = [(i, "clean ascii text here", "en", "good", 0)
            for i in range(10)]
    docs += [(100 + i, "bad � text \x01 here�", "en", "bad", 0)
             for i in range(10)]
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_charset_audit

    out = {r["source"]: r for r in q_charset_audit(spark, d).collect()}
    g, b = out["good"], out["bad"]
    assert g["ascii_share"] == 1.0
    assert g["repl_char_rate"] == 0.0 and g["ctrl_char_rate"] == 0.0
    assert g["is_corrupt"] is False
    # "bad � text \x01 here�" = 18 codepoints: 2 repl chars (the only
    # non-ASCII), 1 control byte
    assert b["repl_char_rate"] == round(2 / 18, 6)
    assert b["ctrl_char_rate"] == round(1 / 18, 6)
    assert b["ascii_share"] == round(1 - 2 / 18, 6)
    assert b["is_corrupt"] is True


def test_precision_audit_infers_scale(spark, tmp_path):
    """All-integer values infer 'integer'; 2dp prices infer
    'decimal_2'; full-precision floats infer 'float'; rates exact."""
    rows = []
    eid = 0
    for i in range(20):
        rows.append((eid, "2026-01-01 01:00:00", 1, "ints",
                     float(i), "{}")); eid += 1
        rows.append((eid, "2026-01-01 01:00:00", 1, "prices",
                     i + 0.25, "{}")); eid += 1
        rows.append((eid, "2026-01-01 01:00:00", 1, "floats",
                     i + 0.123456, "{}")); eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_precision_audit

    out = {r["event_type"]: r for r in q_precision_audit(spark, d).collect()}
    assert out["ints"]["inferred_scale"] == "integer"
    assert out["ints"]["int_rate"] == 1.0
    assert out["prices"]["inferred_scale"] == "decimal_2"
    assert out["prices"]["int_rate"] == 0.0
    assert out["prices"]["dp2_rate"] == 1.0
    assert out["floats"]["inferred_scale"] == "float"


def test_monotonicity_check_finds_the_regression(spark, tmp_path):
    """A cumulative counter that resets once: flagged with the drop
    magnitude; a clean counter is monotone; single-event users are
    trivially monotone."""
    rows = []
    eid = 0
    vals_bad = [1.0, 2.0, 5.0, 3.5, 6.0]   # one reset of -1.5
    vals_good = [1.0, 1.0, 2.0, 9.0]       # ties are NOT decreases
    for uid, vals in ((1, vals_bad), (2, vals_good), (3, [7.0])):
        for i, v in enumerate(vals):
            rows.append(
                (eid, f"2026-01-01 {i + 1:02d}:00:00", uid, "c", v, "{}")
            )
            eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_monotonicity_check

    out = {r["user_id"]: r for r in q_monotonicity_check(spark, d).collect()}
    assert out[1]["n_decreasing"] == 1
    assert out[1]["worst_drop"] == -1.5
    assert out[1]["is_monotone"] is False
    assert out[1]["decreasing_rate"] == 0.25
    assert out[2]["is_monotone"] is True  # ties allowed
    assert out[3]["is_monotone"] is True and out[3]["n_events"] == 1


# round 4y ------------------------------------------------------------------

def test_keyness_shift_ranks_the_burst_token(spark, tmp_path):
    """'breach' appears only in the current half, 'legacy' only in the
    base half, filler is balanced: breach ranks #1 with direction up,
    legacy is the top 'down' token, filler never makes the extremes."""
    docs = []
    i = 0
    for _ in range(50):
        # even ids -> base half, odd -> curr half
        docs.append((2 * i, "filler words common to both legacy", "en", "s", 0))
        docs.append((2 * i + 1, "filler words common to both breach breach", "en", "s", 0))
        i += 1
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_keyness_shift

    out = q_keyness_shift(spark, d).collect()
    assert out[0]["token"] == "breach"
    assert out[0]["direction"] == "up" and out[0]["n_base"] == 0
    downs = [r for r in out if r["direction"] == "down"]
    assert downs and downs[0]["token"] == "legacy"
    top3 = {r["token"] for r in out[:3]}
    assert "filler" not in top3


def test_sample_fidelity_certifies_the_hash_sample(spark, tmp_path):
    """A 2000-doc uniform source: the md5-prefix sample rate lands
    near 26/256 and the sample's length distribution is
    representative (psi <= 0.1); counts reconcile."""
    docs = [(i, "x", "en", "s", (i % 16) * 256) for i in range(2000)]
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_sample_fidelity

    (r,) = q_sample_fidelity(spark, d).collect()
    assert r["n_full"] == 2000
    assert 0.06 <= r["sample_rate"] <= 0.15  # ~26/256 with noise
    assert r["is_representative"] is True
    assert r["psi"] >= 0.0


# round 4z ------------------------------------------------------------------

def test_burstiness_regimes(spark, tmp_path):
    """A constant 100/day series reads B = -1 (periodic); a series
    that dumps everything on one of ten days reads strongly bursty;
    exact σ/μ from integer sums."""
    rows, eid = [], 0
    for day in range(1, 11):
        for _ in range(100):
            rows.append((eid, f"2026-01-{day:02d} 06:00:00", 1,
                         "steady", 0.0, "{}")); eid += 1
        n = 991 if day == 5 else 1
        for _ in range(n):
            rows.append((eid, f"2026-01-{day:02d} 07:00:00", 1,
                         "bursty", 0.0, "{}")); eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_burstiness_index

    out = {r["event_type"]: r for r in q_burstiness_index(spark, d).collect()}
    assert out["steady"]["burstiness"] == -1.0
    assert out["steady"]["regime"] == "periodic"
    assert out["bursty"]["burstiness"] > 0.3
    assert out["bursty"]["regime"] == "bursty"
    assert out["steady"]["mean_daily"] == 100.0


def test_type_cooccurrence_lift(spark, tmp_path):
    """Types 'a' and 'b' always co-occur in the same users (lift 2 on
    a half-and-half universe: P(ab)=.5, P(a)=P(b)=.5); 'a' and 'c'
    never share a user (lift 0, exclusive)."""
    rows, eid = [], 0
    for uid in range(10):          # users 0..9 do a AND b
        for et in ("a", "b"):
            rows.append((eid, "2026-01-01 01:00:00", uid, et, 0.0, "{}"))
            eid += 1
    for uid in range(10, 20):      # users 10..19 only c
        rows.append((eid, "2026-01-01 01:00:00", uid, "c", 0.0, "{}"))
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_type_cooccurrence

    out = {
        (r["type_a"], r["type_b"]): r
        for r in q_type_cooccurrence(spark, d).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_both"] == 10 and ab["lift"] == 2.0
    assert ab["relation"] == "associated"
    assert ("a", "c") not in out  # zero co-occurrence -> no pair row


# round 4aa -----------------------------------------------------------------

def test_hill_tail_index_heavy_vs_light(spark, tmp_path):
    """A Pareto(α=1.2)-shaped source reads 'heavy'; a near-constant
    source reads 'light' with a small hill; the degenerate
    constant-length source gets NULL alpha, not infinity."""
    docs = []
    i = 0
    for j in range(200):  # Pareto-ish: x = 100 / u^(1/1.2)
        u = (j + 0.5) / 200
        docs.append((i, "x", "en", "heavy", int(100 / (u ** (1 / 1.2)))))
        i += 1
    for j in range(200):  # tight range -> light tail
        docs.append((i, "x", "en", "light", 1000 + (j % 7)))
        i += 1
    for j in range(60):   # constant -> degenerate
        docs.append((i, "x", "en", "const", 500))
        i += 1
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_hill_tail_index

    out = {r["source"]: r for r in q_hill_tail_index(spark, d).collect()}
    assert out["heavy"]["tail"] == "heavy" and out["heavy"]["alpha"] < 2.0
    assert out["light"]["tail"] == "light"
    assert out["const"]["alpha"] is None and out["const"]["tail"] == "light"
    assert out["heavy"]["k"] == 50


def test_label_balance_detects_collapse(spark, tmp_path):
    """A uniform 4-label set is balanced (chi2 ~ 0); a collapsed set
    where one label holds 70% fails the 2*dof gate with max_share
    0.7."""
    rows = [(i, [0.0], i % 4) for i in range(400)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    from anomalydetection_spark.queries import q_label_balance

    (r,) = q_label_balance(spark, d).collect()
    assert r["chi2"] == 0.0 and r["is_balanced"] is True
    rows = [(i, [0.0], 0 if i < 280 else 1 + i % 3) for i in range(400)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    df.write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    (r,) = q_label_balance(spark, d).collect()
    assert r["max_share"] == 0.7
    assert r["is_balanced"] is False and r["chi2"] > 6.0


def test_conversion_latency_percentiles_and_rate(spark, tmp_path):
    """10 viewers: 8 convert at known minute deltas (10x4, 30x3, 240),
    1 never converts, 1 purchases BEFORE viewing (excluded): rate 0.8,
    p50 at the ceil(0.5*8)=4th latency (10), p90 at the 8th (240)."""
    rows, eid = [], 0
    deltas = [10, 10, 10, 10, 30, 30, 30, 240]
    for uid, dm in enumerate(deltas):
        rows.append((eid, "2026-01-01 08:00:00", uid, "view", 0.0, "{}"))
        eid += 1
        h, m = divmod(8 * 60 + dm, 60)
        rows.append((eid, f"2026-01-01 {h:02d}:{m:02d}:00", uid,
                     "purchase", 0.0, "{}"))
        eid += 1
    rows.append((eid, "2026-01-01 08:00:00", 97, "view", 0.0, "{}")); eid += 1
    rows.append((eid, "2026-01-01 09:00:00", 98, "purchase", 0.0, "{}")); eid += 1
    rows.append((eid, "2026-01-01 10:00:00", 98, "view", 0.0, "{}")); eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_conversion_latency

    (r,) = q_conversion_latency(spark, d).collect()
    assert r["n_viewers"] == 10
    assert r["n_converted"] == 8
    assert r["conversion_rate"] == 0.8
    assert r["p50_minutes"] == 10
    assert r["p90_minutes"] == 240


# round 4ab -----------------------------------------------------------------

def test_temporal_referential_detects_backdated_ship(spark, tmp_path):
    """A lineitem shipping 3 days before its order flags its status
    group with worst_lead_days -3; the clean group stays
    consistent."""
    orders = [(1, 10, "O", 1.0, "2026-01-10", "P"),
              (2, 11, "F", 1.0, "2026-01-10", "P")]
    odf = spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate_s string,"
        " o_orderpriority string",
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        F.to_timestamp("o_orderdate_s").alias("o_orderdate"),
        "o_orderpriority",
    )
    lines = [(1, "2026-01-12"), (1, "2026-01-15"),
             (2, "2026-01-07"), (2, "2026-01-20")]
    ldf = spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate_s string"
    ).select(
        "l_orderkey", F.to_timestamp("l_shipdate_s").alias("l_shipdate")
    )
    d = str(tmp_path / "sf")
    odf.write.mode("overwrite").parquet(f"{d}/orders.parquet")
    ldf.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    from anomalydetection_spark.queries import q_temporal_referential

    out = {r["o_orderstatus"]: r
           for r in q_temporal_referential(spark, d).collect()}
    assert out["O"]["is_consistent"] is True
    assert out["O"]["worst_lead_days"] == 2
    assert out["F"]["n_violations"] == 1
    assert out["F"]["worst_lead_days"] == -3
    assert out["F"]["violation_rate"] == 0.5


def test_dispersion_regimes_with_zero_customers(spark, tmp_path):
    """All customers at exactly 2 orders -> variance 0, 'regular';
    zero-order customers are counted (n_zero), not dropped."""
    cust = [(i,) for i in range(10)]
    spark.createDataFrame(cust, "c_custkey long").write.mode(
        "overwrite"
    ).parquet(f"{tmp_path}/sf/customer.parquet")
    orders = []
    k = 0
    for i in range(8):  # customers 0..7 get 2 orders; 8,9 get none
        for _ in range(2):
            orders.append((k, i, "O", 1.0, "2026-01-01", "P")); k += 1
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
    from anomalydetection_spark.queries import q_dispersion_test

    (r,) = q_dispersion_test(spark, str(tmp_path / "sf")).collect()
    assert r["n_customers"] == 10 and r["n_zero"] == 2
    assert r["mean_orders"] == 1.6
    # var of [2]*8+[0]*2 (sample) = (8*0.16+2*2.56)/9 = 0.711111
    assert r["var_orders"] == round((8 * 0.16 + 2 * 2.56) / 9, 6)
    assert r["regime"] == "regular"


def test_shingle_saturation_knee(spark, tmp_path):
    """A corpus of repeated 5-word sentences: k=1 dup rate is extreme
    (tiny vocabulary), dup rate decreases monotonically with k, and
    counts follow n_tokens - (k-1) per doc."""
    docs = [(i, "the cat sat on mats", "en", "s", 0) for i in range(20)]
    docs += [(100 + i, "dogs run through tall grass", "en", "s", 0)
             for i in range(20)]
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_shingle_saturation

    out = {r["k"]: r for r in q_shingle_saturation(spark, d).collect()}
    assert out[1]["n_shingles"] == 200 and out[1]["n_distinct"] == 10
    assert out[5]["n_shingles"] == 40 and out[5]["n_distinct"] == 2
    rates = [out[k]["dup_rate"] for k in (1, 2, 3, 5)]
    assert rates == sorted(rates, reverse=True)


# round 4ac -----------------------------------------------------------------

def test_cardinality_drift_explosion_and_collapse(spark, tmp_path):
    """props explodes (2 -> 100 distinct), event_type collapses
    (4 -> 1), user_id stays stable — each verdict lands on the right
    column."""
    rows = []
    for i in range(200):
        half_even = (i % 2 == 0)
        rows.append((
            i, "2026-01-01 01:00:00", i % 10,
            ("a" if not half_even else "abcd"[(i // 2) % 4]),
            0.0,
            ('{"k":%d}' % i if not half_even else '{"k":0}'
             if i % 4 else '{"k":1}'),
        ))
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_cardinality_drift

    out = {r["col"]: r for r in q_cardinality_drift(spark, d).collect()}
    assert out["props"]["verdict"] == "exploded"
    assert out["event_type"]["verdict"] == "collapsed"
    assert out["event_type"]["d_curr"] == 1
    assert out["user_id"]["verdict"] == "stable"


def test_unit_price_outliers_flags_ratio_break(spark, tmp_path):
    """Part 1's lines at a consistent 10.0 unit price plus one line at
    100.0: only that line is an outlier; per-part medians keep part
    2's different-but-consistent 50.0 clean."""
    rows = []
    k = 0
    for _ in range(9):
        rows.append((k, 1, 1, 1, 2.0, 20.0, 0.0, 0.0, "N", "O",
                     "2026-01-01")); k += 1
    rows.append((k, 1, 1, 1, 2.0, 200.0, 0.0, 0.0, "N", "O",
                 "2026-01-01")); k += 1
    for _ in range(5):
        rows.append((k, 2, 1, 1, 4.0, 200.0, 0.0, 0.0, "R", "F",
                     "2026-01-01")); k += 1
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate string",
    )
    df.write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
    from anomalydetection_spark.queries import q_unit_price_outliers

    out = {r["l_returnflag"]: r
           for r in q_unit_price_outliers(
               spark, str(tmp_path / "sf")).collect()}
    assert out["N"]["n_outliers"] == 1 and out["N"]["outlier_rate"] == 0.1
    assert out["R"]["n_outliers"] == 0


def test_bounce_rate_singleton_sessions(spark, tmp_path):
    """User 1: a 3-event session then (90 min later) a singleton;
    user 2: one singleton. Day sees 3 sessions, 2 bounces."""
    rows = [
        (0, "2026-01-01 08:00:00", 1, "a", 0.0, "{}"),
        (1, "2026-01-01 08:10:00", 1, "a", 0.0, "{}"),
        (2, "2026-01-01 08:20:00", 1, "a", 0.0, "{}"),
        (3, "2026-01-01 10:00:00", 1, "a", 0.0, "{}"),
        (4, "2026-01-01 09:00:00", 2, "a", 0.0, "{}"),
    ]
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_bounce_rate

    (r,) = q_bounce_rate(spark, d).collect()
    assert r["n_sessions"] == 3 and r["n_bounces"] == 2
    assert r["bounce_rate"] == round(2 / 3, 6)


# round 4ad -----------------------------------------------------------------

def test_timestamp_ties_storm_detection(spark, tmp_path):
    """Day 1: 10 events batch-stamped on ONE (user, ts) -> tie storm
    (rate 10/12, max_tie 10). Day 2: distinct timestamps -> clean.
    Ties across DIFFERENT users are not ties."""
    rows = []
    eid = 0
    for _ in range(10):
        rows.append((eid, "2026-01-01 08:00:00", 1, "a", 0.0, "{}"))
        eid += 1
    rows.append((eid, "2026-01-01 09:00:00", 1, "a", 0.0, "{}")); eid += 1
    rows.append((eid, "2026-01-01 08:00:00", 2, "a", 0.0, "{}")); eid += 1
    for i in range(5):
        rows.append((eid, f"2026-01-02 08:0{i}:00", 1, "a", 0.0, "{}"))
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_timestamp_ties

    out = {r["day"]: r for r in q_timestamp_ties(spark, d).collect()}
    d1 = out["2026-01-01"]
    assert d1["n_tied"] == 10 and d1["max_tie"] == 10
    assert d1["tie_rate"] == round(10 / 12, 6)
    assert d1["is_tie_storm"] is True
    d2 = out["2026-01-02"]
    assert d2["n_tied"] == 0 and d2["is_tie_storm"] is False


def test_id_gap_audit_missing_and_duplicated(spark, tmp_path):
    """Ids 0..9 with 3,7 missing and 5 duplicated: overall scope
    reports n_missing 2, n_duplicated 1, density 0.8; per-type scopes
    carry their own ranges."""
    ids = [0, 1, 2, 4, 5, 5, 6, 8, 9]
    rows = [
        (i, "2026-01-01 01:00:00", 1, "a" if i < 5 else "b", 0.0, "{}")
        for i in ids
    ]
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_id_gap_audit

    out = {r["scope"]: r for r in q_id_gap_audit(spark, d).collect()}
    allr = out["__all__"]
    assert allr["n_missing"] == 2  # 3 and 7
    assert allr["n_duplicated"] == 1  # the extra 5
    assert allr["density"] == 0.8  # 8 distinct / span 10
    assert out["a"]["id_max"] == 4 and out["b"]["id_min"] == 5


# round 4ae -----------------------------------------------------------------

def test_scale_drift_widened_and_degenerate(spark, tmp_path):
    """Type 'w': base IQR 10, curr IQR 100 -> widened (ratio 10);
    type 's': identical halves -> stable ratio 1.0; type 'c':
    constant base -> 'degenerate' with NULL ratio, not infinity."""
    rows, eid = [], 0
    for i in range(100):
        # 'w': base values 0..9 repeating, curr 0..99 (x10 spread)
        rows.append((2 * eid, "2026-01-01 01:00:00", 1, "w",
                     float(i % 10), "{}"))
        rows.append((2 * eid + 1, "2026-01-01 01:00:00", 1, "w",
                     float(i), "{}"))
        rows.append((2 * eid + 200, "2026-01-01 01:00:00", 1, "s",
                     float(i % 20), "{}"))
        rows.append((2 * eid + 201, "2026-01-01 01:00:00", 1, "s",
                     float(i % 20), "{}"))
        rows.append((2 * eid + 400, "2026-01-01 01:00:00", 1, "c",
                     5.0, "{}"))
        rows.append((2 * eid + 401, "2026-01-01 01:00:00", 1, "c",
                     float(i), "{}"))
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_scale_drift

    out = {r["event_type"]: r for r in q_scale_drift(spark, d).collect()}
    assert out["w"]["verdict"] == "widened" and out["w"]["ratio"] > 5
    assert out["s"]["verdict"] == "stable" and out["s"]["ratio"] == 1.0
    assert out["c"]["verdict"] == "degenerate"
    assert out["c"]["ratio"] is None


def test_user_novelty_mix(spark, tmp_path):
    """Day 1: 3 users, all new (share 1.0). Day 2: those 3 return plus
    2 fresh -> share 0.4. Multiple events per user-day count once."""
    rows, eid = [], 0
    for uid in (1, 2, 3):
        for _ in range(3):  # multiple events, one active-user row
            rows.append((eid, "2026-01-01 08:00:00", uid, "a", 0.0, "{}"))
            eid += 1
    for uid in (1, 2, 3, 4, 5):
        rows.append((eid, "2026-01-02 08:00:00", uid, "a", 0.0, "{}"))
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_user_novelty

    out = {r["day"]: r for r in q_user_novelty(spark, d).collect()}
    assert out["2026-01-01"]["n_active"] == 3
    assert out["2026-01-01"]["new_share"] == 1.0
    assert out["2026-01-02"]["n_active"] == 5
    assert out["2026-01-02"]["n_new"] == 2
    assert out["2026-01-02"]["new_share"] == 0.4


# round 4af -----------------------------------------------------------------

def test_clustering_factor_layout_verdicts(spark, tmp_path):
    """event_type written in 10-row runs reads 'clustered' (avg_run
    10); user_id alternating every row reads 'shuffled' (avg_run 1);
    NULL runs count as runs, not boundaries on every row."""
    rows = []
    for i in range(100):
        rows.append((
            i, "2026-01-01 01:00:00",
            i % 2,                      # alternates -> shuffled
            "abcdefghij"[i // 10],      # 10-row runs -> clustered
            None if i < 50 else 1.0,    # two 50-row runs
            "{}",
        ))
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_clustering_factor

    out = {r["col"]: r for r in q_clustering_factor(spark, d).collect()}
    assert out["event_type"]["n_runs"] == 10
    assert out["event_type"]["avg_run"] == 10.0
    assert out["event_type"]["layout"] == "clustered"
    assert out["user_id"]["n_runs"] == 100
    assert out["user_id"]["layout"] == "shuffled"
    assert out["value"]["n_runs"] == 2  # NULL run + 1.0 run


def test_join_size_forecast_exact_prediction(spark, tmp_path):
    """2 orders x (3, 5) lineitems plus an orphan line: predicted rows
    = 3 + 5 = 8 (exactly what the real join yields), max contribution
    5, blowups vs both inputs exact."""
    orders = [(1, 1, "O", 1.0, "2026-01-01", "P"),
              (2, 1, "O", 1.0, "2026-01-01", "P")]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate string, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/orders.parquet")
    lines = [(1, "2026-01-02")] * 3 + [(2, "2026-01-02")] * 5
    lines += [(99, "2026-01-02")]  # orphan key: contributes nothing
    spark.createDataFrame(
        lines, "l_orderkey long, l_shipdate string"
    ).write.mode("overwrite").parquet(f"{tmp_path}/sf/lineitem.parquet")
    from anomalydetection_spark.queries import q_join_size_forecast

    (r,) = q_join_size_forecast(spark, str(tmp_path / "sf")).collect()
    assert r["n_shared_keys"] == 2
    assert r["predicted_rows"] == 8
    assert r["max_key_contrib"] == 5
    assert r["blowup_vs_orders"] == 4.0
    assert r["blowup_vs_lineitem"] == round(8 / 9, 6)


# round 4ag -----------------------------------------------------------------

def test_random_walk_vs_stationary(spark, tmp_path):
    """A cumulative ramp (10,20,...,200) reads 'trending' (diffs are
    constant, levels accumulate); an alternating 100/110 series reads
    'stationary' (diff variance dominates)."""
    rows, eid = [], 0
    for day in range(1, 21):
        for _ in range(day * 10):  # ramp
            rows.append((eid, f"2026-01-{day:02d} 06:00:00", 1,
                         "ramp", 0.0, "{}")); eid += 1
        for _ in range(100 if day % 2 else 110):  # oscillator
            rows.append((eid, f"2026-01-{day:02d} 07:00:00", 1,
                         "osc", 0.0, "{}")); eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_random_walk_test

    out = {r["event_type"]: r for r in q_random_walk_test(spark, d).collect()}
    assert out["ramp"]["verdict"] == "trending"
    assert out["ramp"]["var_diff"] == 0.0  # perfectly constant steps
    assert out["osc"]["verdict"] == "stationary"
    assert out["osc"]["ratio"] > 0.5


def test_traffic_concentration_bot_day(spark, tmp_path):
    """Day 1: 100 users x 1 event each -> top10_share 0.1. Day 2: one
    bot fires 900 of 1000 events -> concentrated."""
    rows, eid = [], 0
    for u in range(100):
        rows.append((eid, "2026-01-01 06:00:00", u, "a", 0.0, "{}"))
        eid += 1
    for _ in range(900):
        rows.append((eid, "2026-01-02 06:00:00", 666, "a", 0.0, "{}"))
        eid += 1
    for u in range(100):
        rows.append((eid, "2026-01-02 07:00:00", u, "a", 0.0, "{}"))
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_traffic_concentration

    out = {r["day"]: r for r in q_traffic_concentration(spark, d).collect()}
    assert out["2026-01-01"]["top10_share"] == 0.1
    assert out["2026-01-01"]["is_concentrated"] is False
    d2 = out["2026-01-02"]
    assert d2["n_events"] == 1000 and d2["top10_share"] >= 0.9
    assert d2["is_concentrated"] is True


def test_dau_churn_replacement(spark, tmp_path):
    """Day 1 actives {1,2,3,4}; day 2 actives {3,4,5,6}: day 1 retains
    2 of 4 (churn 0.5); the last day churns 1.0 by boundary
    definition."""
    rows, eid = [], 0
    for u in (1, 2, 3, 4):
        rows.append((eid, "2026-01-01 06:00:00", u, "a", 0.0, "{}"))
        eid += 1
    for u in (3, 4, 5, 6):
        rows.append((eid, "2026-01-02 06:00:00", u, "a", 0.0, "{}"))
        eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_dau_churn

    out = {r["day"]: r for r in q_dau_churn(spark, d).collect()}
    assert out["2026-01-01"]["n_retained_next_day"] == 2
    assert out["2026-01-01"]["churn_rate"] == 0.5
    assert out["2026-01-02"]["churn_rate"] == 1.0


# round 4ah -----------------------------------------------------------------

def test_rank_stability_head_rotation(spark, tmp_path):
    """Same 20 heavy users in both halves -> jaccard 1.0 stable; a
    full head swap (users 0-19 heavy in base, 100-119 in curr) ->
    jaccard 0.0, NULL rank shift, unstable."""
    rows, eid = [], 0
    # stable case
    for u in range(20):
        for _ in range(10):
            rows.append((2 * eid, "2026-01-01 01:00:00", u, "a", 0.0, "{}"))
            rows.append((2 * eid + 1, "2026-01-01 01:00:00", u, "a", 0.0, "{}"))
            eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_rank_stability

    (r,) = q_rank_stability(spark, d).collect()
    assert r["jaccard"] == 1.0 and r["is_stable"] is True
    assert r["avg_rank_shift"] == 0.0
    rows, eid = [], 0
    for u in range(20):
        for _ in range(10):
            rows.append((2 * eid, "2026-01-01 01:00:00", u, "a", 0.0, "{}"))
            rows.append((2 * eid + 1, "2026-01-01 01:00:00", 100 + u,
                         "a", 0.0, "{}"))
            eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    (r,) = q_rank_stability(spark, d).collect()
    assert r["jaccard"] == 0.0 and r["is_stable"] is False
    assert r["n_union"] == 40
    assert r["avg_rank_shift"] is None


def test_dominance_check_clean_vs_crossing(spark, tmp_path):
    """'short' sits entirely below 'long' -> a_shorter; 'mixed'
    straddles both ends against 'mid' -> crossing."""
    docs, i = [], 0
    for src, lengths in (
        ("short", [100] * 50),
        ("long", [3000] * 50),
        ("mid", [1500] * 50),
        ("mixed", [100] * 25 + [3900] * 25),
    ):
        for L in lengths:
            docs.append((i, "x", "en", src, L)); i += 1
    d = _write(
        spark.createDataFrame(
            docs,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ),
        tmp_path,
        "documents",
    )
    from anomalydetection_spark.queries import q_dominance_check

    out = {
        (r["source_a"], r["source_b"]): r["dominance"]
        for r in q_dominance_check(spark, d).collect()
    }
    assert out[("long", "short")] == "b_shorter"
    assert out[("mid", "short")] == "b_shorter"
    assert out[("long", "mixed")] == "crossing" or \
        out[("long", "mixed")] == "b_shorter"
    assert out[("mid", "mixed")] == "crossing"


def test_round_number_bias_manual_entry(spark, tmp_path):
    """'sensor' values are uniform integers 1..100 (10% multiples of
    10, lift 1.0, unbiased); 'manual' is 80% round hundreds ->
    lift near 10, biased; a no-integer type reports NULL lift."""
    rows, eid = [], 0
    for i in range(100):
        rows.append((eid, "2026-01-01 01:00:00", 1, "sensor",
                     float(i + 1), "{}")); eid += 1
    for i in range(40):
        rows.append((eid, "2026-01-01 01:00:00", 1, "manual",
                     100.0, "{}")); eid += 1
    for i in range(10):
        rows.append((eid, "2026-01-01 01:00:00", 1, "manual",
                     float(7 + i * 10), "{}")); eid += 1
    for i in range(10):
        rows.append((eid, "2026-01-01 01:00:00", 1, "frac",
                     i + 0.37, "{}")); eid += 1
    d = _write(_events(spark, rows), tmp_path, "events")
    from anomalydetection_spark.queries import q_round_number_bias

    out = {r["event_type"]: r for r in q_round_number_bias(spark, d).collect()}
    assert out["sensor"]["lift"] == 1.0
    assert out["sensor"]["is_biased"] is False
    assert out["manual"]["lift"] == 8.0  # 40 of 50 ints are mult-10
    assert out["manual"]["is_biased"] is True
    assert out["frac"]["lift"] is None
    assert out["frac"]["is_biased"] is False
