"""Round-5 batch: property-oracle contracts for the formerly
rows-only seeded trio (ann_ivf recall-vs-exact, iforest planted
outliers, similarity-groups invariants). Oracle parity runs in
tools/check_oracles.py; these tests pin the property SEMANTICS on
small real data and on adversarial constructions."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


def test_ann_ivf_emits_exact_topk_and_recall(spark):
    from anomalydetection_spark.queries import q_ann_ivf

    rows = {r["query_id"]: r for r in q_ann_ivf(spark, SF).collect()}
    assert set(rows) == {0, 1, 2, 3, 4}
    for r in rows.values():
        ids = r["exact_top3"].split(",")
        assert len(ids) == 3 and all(i.isdigit() for i in ids)
        # a query vector is never its own neighbor
        assert str(r["query_id"]) not in ids
    # recall_ok is the overall-recall property — one verdict, all rows
    assert len({r["recall_ok"] for r in rows.values()}) == 1


def test_iforest_planted_outliers_isolated(spark):
    from anomalydetection_spark.queries import q_iforest_scores

    row = q_iforest_scores(spark, SF).collect()[0]
    assert row["n_planted"] == 8
    assert row["n_natural"] > 0
    assert row["planted_isolated"]
    assert row["planted_below_gate"]
    assert row["natural_frac_ok"]


def test_similarity_groups_invariants(spark):
    from anomalydetection_spark.queries import q_similarity_groups

    out = q_similarity_groups(spark, SF).collect()
    assert out, "at least one lang group expected"
    for r in out:
        assert r["cover_ok"], r
        assert r["groups_bounded_ok"], r
        assert r["exemplar_member_ok"], r
        assert 1 <= r["n_distinct_snippets"] <= r["n_rows"]


def test_similarity_groups_max_exemplar_equals_lang_max(spark):
    """Score-ordered greedy makes the top-score row an exemplar, so
    max(best_score) == max(score) per lang — the exact hash-compared
    value in the oracle contract."""
    from anomalydetection_spark.queries import _t, q_similarity_groups

    got = {
        r["lang"]: r["max_best_score"]
        for r in q_similarity_groups(spark, SF).collect()
    }
    want = {
        r["lang"]: round(float(r["mx"]), 2)
        for r in _t(spark, SF, "documents")
        .filter(F.col("doc_id") < 200)
        .groupBy("lang")
        .agg(F.max("n_chars").alias("mx"))
        .collect()
    }
    assert got == want
