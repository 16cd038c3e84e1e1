"""Incremental profiling: mergeable partials == direct computation,
and the state store scans only new/changed partitions."""

import pyspark.sql.functions as F
import pytest

from anomalydetection_spark.operators.incremental_profile import (
    IncrementalProfiler,
    merge_partials,
    profile_partials,
)


def _docs(spark, n, pid_mod=4, start=0):
    return (
        spark.range(start, start + n)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % pid_mod).cast("int").alias("pid"),
            F.concat(F.lit("text-"), F.col("id")).alias("text"),
            F.when(F.col("id") % 10 == 0, None)
            .otherwise((F.col("id") % 97).cast("double"))
            .alias("score"),
        )
    )


def test_merge_equals_direct(spark):
    df = _docs(spark, 2000)
    prof = {
        r["column"]: r
        for r in merge_partials(profile_partials(df, "pid")).collect()
    }
    d = df.agg(
        F.count("*").alias("n"),
        F.count("score").alias("m"),
        F.round(F.avg("score"), 6).alias("avg"),
        F.round(F.stddev_samp("score"), 6).alias("std"),
        F.min("score").alias("mn"),
        F.max("score").alias("mx"),
    ).first()
    s = prof["score"]
    assert s["n_rows"] == d["n"] == 2000
    assert s["n_null"] == d["n"] - d["m"] == 200
    assert s["avg"] == d["avg"]
    assert s["stddev"] == d["std"]
    assert (s["min"], s["max"]) == (d["mn"], d["mx"])
    # string column profiles by length
    t = prof["text"]
    assert t["n_null"] == 0
    assert t["min"] == len("text-0") and t["max"] == len("text-1999")


def test_hll_merge_is_lossless(spark):
    """Register-max merge: estimate from merged per-partition sketches
    == estimate from one direct sketch over the whole column."""
    df = _docs(spark, 5000, pid_mod=8)
    merged = {
        r["column"]: r["n_distinct"]
        for r in merge_partials(profile_partials(df, "pid")).collect()
    }
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("doc_id")).alias("d"),
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col("score").cast("string"))
        ).alias("s"),
    ).first()
    assert merged["doc_id"] == direct["d"]
    assert merged["score"] == direct["s"]
    # and the estimate tracks truth (5000 distinct ids, default lgK)
    assert abs(merged["doc_id"] - 5000) / 5000 < 0.05


def test_incremental_scans_only_new_partitions(spark, tmp_path):
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 1000, pid_mod=4)
    r1 = ip.update(base, "pid", run_id="r1")
    assert r1["profiled_partitions"] == ["0", "1", "2", "3"]
    assert r1["reused_partitions"] == []

    # unchanged table → nothing profiled, profile identical
    r2 = ip.update(base, "pid", run_id="r2")
    assert r2["profiled_partitions"] == []
    assert len(r2["reused_partitions"]) == 4

    # two appended partitions → only they are profiled
    more = base.unionByName(
        _docs(spark, 500, pid_mod=4, start=1000).withColumn(
            "pid", (F.col("doc_id") % 2 + 4).cast("int")
        )
    )
    r3 = ip.update(more, "pid", run_id="r3")
    assert r3["profiled_partitions"] == ["4", "5"]
    assert len(r3["reused_partitions"]) == 4

    # merged profile == full recompute on the grown table
    inc = {
        (r["column"]): (r["n_rows"], r["n_null"], r["avg"], r["stddev"],
                        r["min"], r["max"])
        for r in r3["profile"].collect()
    }
    full = {
        (r["column"]): (r["n_rows"], r["n_null"], r["avg"], r["stddev"],
                        r["min"], r["max"])
        for r in merge_partials(profile_partials(more, "pid")).collect()
    }
    assert inc == full

    # zero-scan read-back of the committed state
    again = {
        (r["column"]): (r["n_rows"], r["n_null"])
        for r in ip.profile(spark).collect()
    }
    assert again["doc_id"] == (1500, 0)


def test_changed_partition_reprofiled_hash_mode(spark, tmp_path):
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 800, pid_mod=4)
    ip.update(base, "pid", run_id="r1")
    # rewrite partition 2 in place (score shifted)
    mutated = base.withColumn(
        "score",
        F.when(F.col("pid") == 2, F.col("score") + 1000.0).otherwise(
            F.col("score")
        ),
    )
    r2 = ip.update(mutated, "pid", run_id="r2")
    assert r2["profiled_partitions"] == ["2"]
    prof = {r["column"]: r for r in r2["profile"].collect()}
    assert prof["score"]["max"] > 1000  # the rewrite is visible

    # partition_ids mode trusts stored partitions: same mutation invisible
    ip2 = IncrementalProfiler(str(tmp_path / "state2"))
    ip2.update(base, "pid", run_id="r1", change_detection="partition_ids")
    r = ip2.update(
        mutated, "pid", run_id="r2", change_detection="partition_ids"
    )
    assert r["profiled_partitions"] == []


def test_removed_partition_drops_out(spark, tmp_path):
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 1000, pid_mod=4)
    ip.update(base, "pid", run_id="r1")
    shrunk = base.filter(F.col("pid") != 3)
    r = ip.update(shrunk, "pid", run_id="r2")
    assert r["removed_partitions"] == ["3"]
    assert r["profiled_partitions"] == []
    n = {x["column"]: x["n_rows"] for x in r["profile"].collect()}
    assert n["doc_id"] == shrunk.count()


def test_unsupported_dtype_gets_null_block_only(spark, tmp_path):
    df = _docs(spark, 100).withColumn(
        "meta", F.struct(F.lit("a").alias("k"))
    )
    prof = {
        r["column"]: r
        for r in merge_partials(profile_partials(df, "pid")).collect()
    }
    m = prof["meta"]
    assert m["n_rows"] == 100 and m["n_null"] == 0
    assert m["avg"] is None and m["min"] is None
    assert m["n_distinct"] == 1  # struct sketched via to_json


def test_bad_change_detection_raises(spark, tmp_path):
    ip = IncrementalProfiler(str(tmp_path / "state"))
    with pytest.raises(ValueError, match="change_detection"):
        ip.update(_docs(spark, 10), "pid", change_detection="nope")


def test_incremental_quantiles_track_exact(spark, tmp_path):
    """t-digest state rides the same versioned store: quantiles from
    merged per-partition digests track exact percentiles (<=1% rank
    error band, same as functions/tdigest.py pins), the unchanged-table
    re-run scans nothing, and an append shifts the stored quantiles."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 4000, pid_mod=4)
    r1 = ip.update(
        base, "pid", run_id="r1",
        quantile_cols=["score"], quantiles=[0.5, 0.9],
    )
    qv = {r["q"]: r["value"] for r in r1["quantiles"].collect()}
    exact = base.selectExpr(
        "percentile(score, 0.5) AS m", "percentile(score, 0.9) AS h"
    ).first()
    # score is (id % 97): rank-1% of 3600 non-null values ~ spread of 2
    assert abs(qv[0.5] - exact["m"]) <= 2.0
    assert abs(qv[0.9] - exact["h"]) <= 2.0

    r2 = ip.update(
        base, "pid", run_id="r2",
        quantile_cols=["score"], quantiles=[0.5, 0.9],
    )
    assert r2["profiled_partitions"] == []
    qv2 = {r["q"]: r["value"] for r in r2["quantiles"].collect()}
    assert qv2 == qv  # nothing recomputed, state identical

    # appended heavy-tail partition pulls the p90 up; only it is scanned
    heavy = spark.range(4000, 5000).select(
        F.col("id").alias("doc_id"),
        F.lit(9).cast("int").alias("pid"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        F.lit(500.0).alias("score"),
    )
    r3 = ip.update(
        base.unionByName(heavy), "pid", run_id="r3",
        quantile_cols=["score"], quantiles=[0.5, 0.9],
    )
    assert r3["profiled_partitions"] == ["9"]
    qv3 = {r["q"]: r["value"] for r in r3["quantiles"].collect()}
    assert qv3[0.9] > qv[0.9]

    # zero-scan accessor reads the committed digests
    again = {r["q"]: r["value"] for r in ip.quantiles(
        spark, [0.5, 0.9]).collect()}
    assert again == qv3


def test_quantile_backfill_when_enabled_mid_history(spark, tmp_path):
    """Runs 1..k without quantile_cols, then enabling it must sketch
    the REUSED partitions too (one-time backfill), not just the delta."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 1000, pid_mod=4)
    ip.update(base, "pid", run_id="r1")
    r2 = ip.update(
        base, "pid", run_id="r2", quantile_cols=["score"], quantiles=[0.5]
    )
    assert r2["profiled_partitions"] == []  # moments all reused
    q = {r["column"]: r["value"] for r in r2["quantiles"].collect()}
    exact = base.selectExpr("percentile(score, 0.5) AS m").first()["m"]
    assert abs(q["score"] - exact) <= 2.0


def test_concurrent_commit_detected(spark, tmp_path):
    """Optimistic concurrency: an update computed against version B
    must fail loudly if another writer advanced CURRENT meanwhile."""
    from anomalydetection_spark.operators.incremental_profile import (
        profile_partials as pp,
    )

    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 200)
    ip.update(base, "pid", run_id="r1")
    stale = pp(base, "pid")
    with pytest.raises(RuntimeError, match="concurrent"):
        ip._commit(stale, {}, "r_stale", expected_base=0)
    # correct base still commits
    assert ip._commit(stale, {}, "r_ok", expected_base=1) == 2


def test_drift_since_between_state_versions(spark, tmp_path):
    """Zero-scan drift between committed profiler versions: a rewritten
    partition's column fails, untouched columns pass."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 1000, pid_mod=4)
    r1 = ip.update(base, "pid", run_id="r1")
    mutated = base.withColumn(
        "score",
        F.when(F.col("pid") == 1, F.col("score") * 100.0).otherwise(
            F.col("score")
        ),
    )
    r2 = ip.update(mutated, "pid", run_id="r2")
    assert r2["profiled_partitions"] == ["1"]
    d = ip.drift_since(spark, base_version=r1["version"])
    rows = {(r["column"], r["metric"]): r for r in d.collect()}
    assert rows[("score", "max")]["verdict"] == "fail"   # 100x shift
    assert rows[("doc_id", "max")]["verdict"] == "pass"  # untouched
    assert all(
        r["verdict"] == "pass"
        for (c, m), r in rows.items()
        if c == "text"
    )


def test_non_numeric_quantile_col_raises(spark, tmp_path):
    ip = IncrementalProfiler(str(tmp_path / "state"))
    with pytest.raises(ValueError, match="numeric"):
        ip.update(_docs(spark, 10), "pid", quantile_cols=["text"])
    with pytest.raises(ValueError, match="absent"):
        ip.update(_docs(spark, 10), "pid", quantile_cols=["nope"])


def test_timestamp_columns_profile_tz_free(spark, tmp_path):
    """NTZ timestamps must profile identically under any session
    timezone (the unix_timestamp-on-NTZ trap)."""
    df = spark.range(100).select(
        (F.col("id") % 4).cast("int").alias("pid"),
        F.to_timestamp_ntz(
            F.concat(F.lit("2026-01-01 00:00:"), F.format_string("%02d", F.col("id") % 60))
        ).alias("t_ntz"),
        F.to_timestamp(
            F.concat(F.lit("2026-01-01 00:00:"), F.format_string("%02d", F.col("id") % 60))
        ).alias("t_inst"),
    )
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        a = {r["column"]: (r["min"], r["max"], r["avg"]) for r in
             merge_partials(profile_partials(df, "pid")).collect()}
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        b = {r["column"]: (r["min"], r["max"], r["avg"]) for r in
             merge_partials(profile_partials(df, "pid")).collect()}
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)
    assert a["t_ntz"] == b["t_ntz"]  # NTZ: wall-clock, tz-free
    assert a["t_ntz"][0] > 1.7e9     # epoch-seconds scale


def test_distinct_rate_detects_row_duplication(spark, tmp_path):
    """Doubling every row leaves null_rate/moments identical but halves
    distinct_rate — drift must flag it (RATE-metric gating)."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 1000, pid_mod=4)
    r1 = ip.update(base, "pid", run_id="r1")
    doubled = base.unionByName(base)
    r2 = ip.update(doubled, "pid", run_id="r2")
    prof = {r["column"]: r for r in r2["profile"].collect()}
    assert abs(prof["doc_id"]["distinct_rate"] - 0.5) < 0.03
    d = {(r["column"], r["metric"]): r for r in
         ip.drift_since(spark, base_version=r1["version"]).collect()}
    assert d[("doc_id", "distinct_rate")]["verdict"] == "fail"
    assert d[("doc_id", "null_rate")]["verdict"] == "pass"
    assert d[("doc_id", "avg")]["verdict"] == "pass"


def test_quantile_drift_since_detects_shape_shift(spark, tmp_path):
    """Distribution drift from stored digests: a mean-preserving-ish
    spread change moves Wasserstein even though moments drift little;
    an unchanged version pair scores ~0."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 2000, pid_mod=4)
    r1 = ip.update(base, "pid", run_id="r1", quantile_cols=["score"])
    r2 = ip.update(base, "pid", run_id="r2", quantile_cols=["score"])
    same = {r["column"]: r for r in ip.quantile_drift_since(
        spark, base_version=r1["version"], cur_version=r2["version"]
    ).collect()}
    assert same["score"]["verdict"] == "pass"
    assert same["score"]["wasserstein"] < 1e-9  # identical state

    shifted = base.withColumn(
        "score",
        F.when(F.col("pid") == 2, F.col("score") + 300.0).otherwise(
            F.col("score")
        ),
    )
    r3 = ip.update(shifted, "pid", run_id="r3", quantile_cols=["score"])
    assert r3["profiled_partitions"] == ["2"]
    d = {r["column"]: r for r in ip.quantile_drift_since(
        spark, base_version=r1["version"]
    ).collect()}
    assert d["score"]["verdict"] == "fail"
    assert d["score"]["wasserstein"] > 50  # ~quarter of rows moved +300


def test_append_mode_merges_and_refuses_replay(spark, tmp_path):
    ip = IncrementalProfiler(str(tmp_path / "state"))
    b1 = _docs(spark, 500).withColumn("pid", F.lit(0))
    b2 = _docs(spark, 500, start=500).withColumn("pid", F.lit(1))
    r1 = ip.append(b1, "pid", run_id="b0")
    assert r1["appended_partitions"] == ["0"]
    r2 = ip.append(b2, "pid", run_id="b1")
    assert r2["n_total_partitions"] == 2
    # merged state == direct profile of the union
    inc = {r["column"]: (r["n_rows"], r["avg"]) for r in
           r2["profile"].collect()}
    full = {r["column"]: (r["n_rows"], r["avg"]) for r in merge_partials(
        profile_partials(b1.unionByName(b2), "pid")).collect()}
    assert inc == full
    # replaying a committed batch id is refused, state unchanged
    with pytest.raises(ValueError, match="double-count"):
        ip.append(b2, "pid", run_id="b1_replay")
    assert ip.current_version() == 2


def test_append_digest_coverage_contract(spark, tmp_path):
    """append() can never backfill (earlier batches' rows are gone), so
    a quantile_cols set that grows mid-history — or disappears — must
    be refused, not silently merged into subset quantiles."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    b1 = _docs(spark, 300).withColumn("pid", F.lit(0))
    b2 = _docs(spark, 300, start=300).withColumn("pid", F.lit(1))
    ip.append(b1, "pid", run_id="b0", quantile_cols=["score"])
    # same column set every batch: fine, digests cover both partitions
    ip.append(b2, "pid", run_id="b1", quantile_cols=["score"])
    qs = {
        (r["column"], r["q"]): r["value"]
        for r in ip.quantiles(spark, [0.5]).collect()
    }
    assert ("score", 0.5) in qs
    b3 = _docs(spark, 300, start=600).withColumn("pid", F.lit(2))
    # growing the column set is unbackfillable → refused
    with pytest.raises(ValueError, match="backfill"):
        ip.append(b3, "pid", run_id="b2", quantile_cols=["score", "doc_id"])
    # dropping quantile tracking entirely would orphan the stored
    # digests (appended partitions invisible to later merges) → refused
    with pytest.raises(ValueError, match="quantile_cols"):
        ip.append(b3, "pid", run_id="b2")
    # enabling tracking mid-history over digest-less partitions is the
    # same subset: a fresh state without digests refuses a late enable
    ip2 = IncrementalProfiler(str(tmp_path / "state2"))
    ip2.append(b1, "pid", run_id="b0")
    with pytest.raises(ValueError, match="backfill"):
        ip2.append(b2, "pid", run_id="b1", quantile_cols=["score"])


def test_vacuum_keeps_window_and_current(spark, tmp_path):
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 200)
    for i in range(5):  # 5 versions (each rewrite forces a re-profile)
        ip.update(
            base.withColumn("score", F.col("score") + i), "pid",
            run_id=f"r{i}",
        )
    assert ip.current_version() == 5
    dropped = ip.vacuum(keep_last=2)
    assert dropped == [1, 2, 3]
    # retained window still serves profiles + drift
    assert ip.profile(spark, version=4).count() > 0
    assert ip.drift_since(spark, base_version=4).count() > 0
    with pytest.raises(ValueError, match="no committed partials"):
        ip.profile(spark, version=2)
    # vacuum is idempotent and guards its arg
    assert ip.vacuum(keep_last=2) == []
    with pytest.raises(ValueError, match="keep_last"):
        ip.vacuum(keep_last=0)


def test_quantile_cols_growth_backfills_per_column(spark, tmp_path):
    """quantile_cols GROWING across runs: the new column must be
    sketched on REUSED partitions too (per-column backfill), not only
    on the changed delta — otherwise its table-level quantiles would
    silently come from a subset of partitions (or be absent when
    nothing changed)."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 1000, pid_mod=4).withColumn(
        "score2", (F.col("doc_id") % 31).cast("double")
    )
    hc = ["doc_id", "text", "score", "score2"]
    ip.update(base, "pid", run_id="r1", hash_cols=hc,
              quantile_cols=["score"], quantiles=[0.5])
    r2 = ip.update(base, "pid", run_id="r2", hash_cols=hc,
                   quantile_cols=["score", "score2"], quantiles=[0.5])
    assert r2["profiled_partitions"] == []  # moments all reused
    q = {r["column"]: r["value"] for r in r2["quantiles"].collect()}
    assert "score2" in q  # present at all, and from ALL partitions:
    exact = base.selectExpr("percentile(score2, 0.5) AS m").first()["m"]
    assert abs(q["score2"] - exact) <= 1.0
    # the original column's digests were carried, not resketched
    exact_s = base.selectExpr("percentile(score, 0.5) AS m").first()["m"]
    assert abs(q["score"] - exact_s) <= 2.0


def test_quantile_drift_constant_column_passes(spark, tmp_path):
    """A constant column has a base digest span of 0; an identical
    current digest (wasserstein 0) must be a pass, not the inf-rel
    false positive — only an actual move off the constant fails."""
    ip = IncrementalProfiler(str(tmp_path / "state"))
    base = _docs(spark, 400, pid_mod=2).withColumn(
        "konst", F.lit(5.0)
    )
    r1 = ip.update(base, "pid", run_id="r1", quantile_cols=["konst"])
    r2 = ip.update(base, "pid", run_id="r2", quantile_cols=["konst"])
    same = {r["column"]: r for r in ip.quantile_drift_since(
        spark, base_version=r1["version"], cur_version=r2["version"]
    ).collect()}
    assert same["konst"]["verdict"] == "pass"
    assert same["konst"]["rel_drift"] == 0.0

    moved = base.withColumn(
        "konst",
        F.when(F.col("pid") == 1, F.lit(900.0)).otherwise(F.lit(5.0)),
    )
    r3 = ip.update(moved, "pid", run_id="r3", quantile_cols=["konst"])
    d = {r["column"]: r for r in ip.quantile_drift_since(
        spark, base_version=r1["version"], cur_version=r3["version"]
    ).collect()}
    assert d["konst"]["verdict"] == "fail"  # span 0 but w >> 0 -> inf rel
