"""Degenerate-input robustness: operators must return empty/identity
results — never raise — on empty frames (the shapes a driver smoke
check or an empty incremental delta produces)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _empty_docs(spark):
    from anomalydetection_spark.schema import DOCUMENTS_SCHEMA

    return spark.createDataFrame([], schema=DOCUMENTS_SCHEMA)


def test_templates_empty(spark):
    from anomalydetection_spark.operators.templates import mine_templates

    df = spark.createDataFrame([], "text string")
    assert mine_templates(df, "text").count() == 0


def test_ann_empty_queries(spark):
    from anomalydetection_spark.operators.ann import ann_lsh_topk, ivf_topk

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    none = e.filter(F.col("vec_id") < 0)
    assert ann_lsh_topk(e, none, k=3).count() == 0
    assert ivf_topk(e, none, k=3, n_centroids=8).count() == 0


def test_dedup_empty(spark):
    from anomalydetection_spark.operators.dedup import minhash_lsh_pairs

    d = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_lsh_pairs(d).count() == 0


def test_orphan_refs_empty_docs(spark, catalog):
    from anomalydetection_spark.operators.referential import orphan_refs

    assert orphan_refs(_empty_docs(spark), catalog, spark).count() == 0


def test_tdigest_empty_frame(spark):
    from anomalydetection_spark.functions.tdigest import tdigest_quantiles

    ev = spark.createDataFrame([], "event_type string, value double")
    assert tdigest_quantiles(ev, "value", ["event_type"], [0.5]).count() == 0


def test_feedback_empty(spark, docs, catalog):
    from anomalydetection_spark.operators.feedback import (
        FEEDBACK_SCHEMA,
        apply_feedback,
    )
    from anomalydetection_spark.plans.pipeline import run_validation

    res = run_validation(spark, docs, catalog=catalog)
    fb = spark.createDataFrame([], schema=FEEDBACK_SCHEMA)
    flagged = apply_feedback(res.violations, fb)
    assert flagged.filter(~F.col("is_anomaly")).count() == 0
    assert flagged.count() == res.violations.count()


def test_empty_catalog_rowlocal_all_refs_orphan(spark, docs):
    """Zero-row catalog through the row-local membership path: every
    non-null ref is an orphan; the pass completes and flags them."""
    from anomalydetection_spark.plans.pipeline import run_validation

    empty_cat = spark.createDataFrame([], "media_ref string")
    res = run_validation(spark, docs, catalog=empty_cat)
    ref = res.violations.filter(F.col("check") == "referential")
    n_ref_docs = ref.select("doc_id").distinct().count()
    # every doc with >=1 non-null media_ref must be flagged
    expect = (
        docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.transform("spans", lambda s: s["media_ref"]),
                    lambda r: r.isNotNull(),
                )
            ).alias("k"),
        )
        .filter(F.col("k") > 0)
        .select("doc_id")
        .distinct()
        .count()
    )
    assert n_ref_docs == expect


def test_preflight_on_empty_table(spark, catalog):
    """Preflight degrades gracefully on an empty docs table: exact tier
    reports zero, sampled checks come back inconclusive (no data, no
    CI), nothing crashes — both sampling modes."""
    from anomalydetection_spark.fixtures import generate_documents
    from anomalydetection_spark.plans.pipeline import preflight_estimate

    empty = generate_documents(spark, 10).filter("partition_id < -1")
    for mode in ("rows", "partitions"):
        rows = {r.check: r for r in preflight_estimate(
            spark, empty, catalog=catalog, fraction=0.5, mode=mode
        ).collect()}
        assert rows["uniqueness"].n_violations == 0
        assert rows["uniqueness"].verdict == "pass"
        sampled = [r for n, r in rows.items() if n != "uniqueness"]
        assert sampled and all(r.verdict == "inconclusive" for r in sampled)


def test_round2d_operators_empty(spark):
    """Every round-2d operator returns empty/identity on empty frames."""
    from anomalydetection_spark.operators.asof import asof_join, range_join
    from anomalydetection_spark.operators.decontaminate import (
        contaminated_docs,
    )
    from anomalydetection_spark.operators.dedup import seed_assign
    from anomalydetection_spark.operators.pii import pii_scan
    from anomalydetection_spark.operators.sample import stratified_sample

    docs = spark.createDataFrame([], "doc_id long, text string")
    vecs = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0])], "sid long, sv array<double>"
    )
    some_vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    pts = spark.createDataFrame([], "pid long, v long")
    iv = spark.createDataFrame([(1, 0, 9)], "iid long, lo long, hi long")

    assert pii_scan(docs).count() == 0
    assert contaminated_docs(docs, docs).count() == 0
    # empty corpus against a real benchmark, and vice versa
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    assert contaminated_docs(docs, bench).count() == 0
    assert contaminated_docs(bench, docs).count() == 0
    assert seed_assign(vecs, seeds).count() == 0
    assert stratified_sample(docs, "text", "doc_id", 3).count() == 0
    assert range_join(pts, iv, "v", "lo", "hi", 10).count() == 0
    # as-of with an EMPTY right side: left survives, asof cols all null
    trades = spark.createDataFrame([(1, 5)], "uid long, t long")
    quotes = spark.createDataFrame([], "uid long, t long, px double")
    rows = asof_join(trades, quotes, "uid", "t", "t", ["px"]).collect()
    assert len(rows) == 1 and rows[0].px_asof is None


def test_seed_assign_empty_seed_set_yields_null_assignment(spark):
    """No seeds → no winner: seed_id/seed_cos must be null, not a
    crash (aggregate over an empty seed array keeps the init value,
    which the operator maps to null)."""
    from anomalydetection_spark.operators.dedup import seed_assign

    seeds = spark.createDataFrame([], "sid long, sv array<double>")
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = seed_assign(vecs, seeds).collect()
    assert len(rows) == 1
    assert rows[0].seed_id is None and rows[0].seed_cos is None


def test_round3_operators_empty_and_degenerate(spark, tmp_path):
    """Round-3 surfaces on empty/degenerate inputs: a dup-free corpus
    splits to kept-only, a single-source corpus yields an empty overlap
    matrix, the preprocess funnel on an empty table keeps nothing and
    still reports well-formed stages."""
    from pyspark.sql import functions as F

    from anomalydetection_spark.operators.decontaminate import (
        source_overlap,
    )
    from anomalydetection_spark.operators.dedup import write_dedup_split
    from anomalydetection_spark.plans.preprocess import run_preprocess

    # dup-free corpus -> zero duplicates, everything kept
    docs = spark.createDataFrame(
        [(i, f"unique{i} words here for doc {i} only now then")
         for i in range(12)],
        "doc_id bigint, text string",
    )
    d = write_dedup_split(docs, str(tmp_path / "split"))
    assert d["n_duplicates"] == 0 and d["n_kept"] == 12
    assert d["n_clusters"] == 0 and d["max_cluster_size"] == 0
    # no __duplicate=true dir was written -> the advertised path is
    # None, not a dangling path that AnalysisExceptions on read
    assert d["duplicates"] is None
    assert spark.read.parquet(d["kept"]).count() == 12

    # one source -> no cross-source pairs
    one = docs.withColumn("source", F.lit("only"))
    assert source_overlap(one, "source", "text", n=4).count() == 0

    # empty corpus through the full funnel
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    res = run_preprocess(spark, empty, benchmark=docs.select("text"))
    assert [s["stage"] for s in res.funnel] == [
        "quality", "dedup", "decontaminate"
    ]
    assert all(s["n_in"] == 0 and s["n_out"] == 0 for s in res.funnel)
    assert res.kept.count() == 0


def test_round4f_analyzers_empty(spark, tmp_path):
    """The three profiling analyzers never raise on an empty table:
    distinctness/format return zero rows, partition_skew returns its
    single summary row with NULL stats (0 partitions), not an error."""
    import os

    from anomalydetection_spark.queries import QUERIES

    td = str(tmp_path)
    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(os.path.join(td, "events.parquet"))
    spark.createDataFrame(
        [],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(os.path.join(td, "documents.parquet"))

    assert QUERIES["distinctness_profile"](spark, td).count() == 0
    assert QUERIES["format_patterns"](spark, td).count() == 0
    r = QUERIES["partition_skew"](spark, td).collect()
    assert len(r) == 1 and r[0]["n_partitions"] == 0
    assert r[0]["gini"] is None and r[0]["skew_ratio"] is None


def test_setsim_empty(spark):
    from anomalydetection_spark.operators.dedup import setsim_prefix_pairs

    d = spark.createDataFrame([], "doc_id long, text string")
    for order in ("df", "hash"):
        assert setsim_prefix_pairs(d, order=order).count() == 0


def test_gaps_islands_queries_empty(spark, tmp_path):
    from anomalydetection_spark.queries import (
        q_coverage_gaps,
        q_k_anonymity,
        q_scd2_intervals,
    )

    spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    spark.createDataFrame(
        [],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    assert q_coverage_gaps(spark, str(tmp_path)).count() == 0
    assert q_scd2_intervals(spark, str(tmp_path)).count() == 0
    assert q_k_anonymity(spark, str(tmp_path)).count() == 0


def test_semistructured_empty(spark):
    from anomalydetection_spark.operators.semistructured import (
        discover_json_keys,
        json_field_audit,
        suggest_json_rule,
    )

    empty = spark.createDataFrame([], "j string")
    assert discover_json_keys(empty, "j") == []
    # explicit keys: no rows -> no count rows, no malformed row
    assert json_field_audit(empty, "j", keys=["a"]).count() == 0
    sug = suggest_json_rule(empty, "j", max_keys=4)
    assert sug == {"required": [], "types": {}, "max_malformed_rate": 0.0}
    # all-null column behaves like empty (n_raw = 0, no crash)
    nulls = spark.createDataFrame([(None,), (None,)], "j string")
    assert json_field_audit(nulls, "j", keys=["a"]).count() == 0


def test_json_contract_empty_frame(spark):
    from anomalydetection_spark.operators.contract import (
        Contract,
        JsonRule,
        contract_verdicts,
    )

    df = spark.createDataFrame([], "j string")
    c = Contract(json={"j": JsonRule(required=("k",),
                                     types={"k": ("number",)})})
    got = {r.check: r.verdict for r in contract_verdicts(df, c).collect()}
    # zero rows violate nothing
    assert set(got.values()) == {"pass"}
