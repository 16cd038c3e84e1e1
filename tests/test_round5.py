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


# ---------------------------------------------------------------------------
# repair.py round-5 hardening: MG-bounded mode candidates (the cap the
# docstring promised), self-certifying exact fallback, and
# special-character column names through plan + apply (ADVICE items).
# ---------------------------------------------------------------------------

def test_repair_mode_mg_bounded_path_certifies(spark):
    from anomalydetection_spark.operators.repair import plan_repairs

    # heavy mode: 'a' holds 60% of non-nulls -> clears n/(k+1) floor
    rows = [("a",)] * 60 + [("b",)] * 25 + [("c",)] * 10 + [(None,)] * 5
    df = spark.createDataFrame(rows, "s string").repartition(4)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any fallback warning fails
        rules = plan_repairs(df, max_mode_candidates=8)
    (r,) = [x for x in rules if x.column == "s"]
    assert r.strategy == "fill_mode" and r.fill_value == "a"
    assert abs(r.confidence - 60 / 95) < 1e-6  # stored at 6dp


def test_repair_mode_flat_column_falls_back_exact(spark):
    from anomalydetection_spark.operators.repair import plan_repairs

    # near-uniform: 120 distinct values, k=4 -> nothing clears the
    # floor; the exact fallback must still find the true mode ('v007'
    # planted with 3 occurrences vs 1 each)
    rows = (
        [(f"v{i:03d}",) for i in range(120)]
        + [("v007",), ("v007",)]
        + [(None,)]
    )
    df = spark.createDataFrame(rows, "s string").repartition(6)
    with pytest.warns(UserWarning, match="Misra-Gries floor"):
        rules = plan_repairs(df, max_mode_candidates=4)
    (r,) = [x for x in rules if x.column == "s"]
    assert r.strategy == "fill_mode" and r.fill_value == "v007"


def test_repair_special_character_column_names(spark):
    from anomalydetection_spark.operators.repair import (
        apply_repairs,
        plan_repairs,
    )

    df = spark.createDataFrame(
        [(1.0, "x"), (None, None), (3.0, "x")],
        ["order value", "select"],  # space + reserved word
    )
    rules = plan_repairs(df)
    by_col = {r.column: r for r in rules}
    assert by_col["order value"].strategy == "fill_median"
    assert by_col["order value"].fill_value == "2.0"
    assert by_col["select"].fill_value == "x"
    out = apply_repairs(df, rules).orderBy("order value").collect()
    assert [r["order value"] for r in out] == [1.0, 2.0, 3.0]
    assert sorted(out, key=lambda r: r["__repaired"])[-1]["__repaired"] == [
        "order value",
        "select",
    ]


def test_repair_cli_exit_code_on_failed_reconciliation(monkeypatch):
    """--repair must not exit 0 when the written output's repaired-cell
    count disagrees with the plan (ADVICE: CI callers key on the exit
    code; a corrupt write may not report success)."""
    import anomalydetection_spark.run as run_mod

    class _FakeSpark:
        def stop(self):
            pass

    monkeypatch.setattr(
        "anomalydetection_spark.session.get_spark",
        lambda **kw: _FakeSpark(),
    )
    results = [
        {"reconciled": False, "n_repaired_cells": 1},
        {"reconciled": True, "n_repaired_cells": 2},
    ]
    monkeypatch.setattr(
        run_mod, "repair_round", lambda spark, args, rid: results.pop(0)
    )
    argv = ["--docs", "/nope", "--out", "/tmp/x", "--repair"]
    assert run_mod.main(argv) == 3
    assert run_mod.main(argv) == 0


def test_dominance_check_identical_distributions_read_equal(
    spark, tmp_path
):
    """Two sources with byte-identical length distributions must read
    'equal', not 'a_shorter' (ADVICE: the >= comparisons give 16/16 on
    both sides for an exact tie)."""
    from anomalydetection_spark.queries import q_dominance_check

    rows = []
    for src in ("alpha", "beta"):
        for i in range(40):
            rows.append((len(rows), src, (i % 8) * 300))
    # and one genuinely shorter source
    for i in range(40):
        rows.append((len(rows), "gamma", 10))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, n_chars long"
    )
    d = str(tmp_path / "sf")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    out = {
        (r["source_a"], r["source_b"]): r["dominance"]
        for r in q_dominance_check(spark, d).collect()
    }
    assert out[("alpha", "beta")] == "equal"
    assert out[("alpha", "gamma")] == "b_shorter"
    assert out[("beta", "gamma")] == "b_shorter"
