"""Benchmark-decontamination operator (operators/decontaminate.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.decontaminate import (
    benchmark_grams,
    contaminated_docs,
    word_ngrams,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_ngrams_distinct_and_short_doc_empty(spark):
    df = _df(spark, [(1, "a b a b a b"), (2, "x y z")])
    out = {
        r.doc_id: sorted(r.g)
        for r in df.select(
            "doc_id", word_ngrams(F.col("text"), 4).alias("g")
        ).collect()
    }
    # sliding 4-grams of "a b a b a b" repeat — distinct leaves 2
    assert out[1] == ["a b a b", "b a b a"]
    assert out[2] == []  # 3 tokens < n


def test_exact_overlap_flagged_partial_not(spark):
    bench = _df(spark, [(100, "the quick brown fox jumps")])
    corpus = _df(
        spark,
        [
            (1, "saw the quick brown fox today"),  # shares 4-gram
            (2, "the quick brown cat sat"),        # only 3-gram overlap
            (3, "quick brown"),                    # too short
        ],
    )
    hits = {
        r.doc_id: r.n_matched_grams
        for r in contaminated_docs(
            corpus, bench, broadcast_grams=True
        ).collect()
    }
    assert hits == {1: 1}  # only 'the quick brown fox' appears in doc 1


def test_benchmark_gram_set_is_distinct(spark):
    bench = _df(spark, [(1, "a b c d"), (2, "a b c d e")])
    grams = sorted(r.gram for r in benchmark_grams(bench).collect())
    assert grams == ["a b c d", "b c d e"]


def test_broadcast_hint_reaches_plan(spark):
    bench = _df(spark, [(100, "the quick brown fox jumps")])
    corpus = _df(spark, [(1, "saw the quick brown fox today")])
    plan = (
        contaminated_docs(corpus, bench, broadcast_grams=True)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_source_overlap_matrix(spark):
    """Planted cross-source leakage: sources A and B share one 4-gram
    sentence, C shares nothing. The matrix reports the (A,B)/(B,A)
    pair with symmetric shared counts and per-left-source fractions;
    C appears in no pair."""
    from anomalydetection_spark.operators.decontaminate import (
        source_overlap,
    )

    shared = "alpha beta gamma delta"
    rows = [
        ("A", shared + " one two three"),
        ("A", "completely different words here now"),
        ("B", shared + " nine ten"),
        ("C", "nothing in common with anyone at all"),
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap(df, "source", "text", n=4).collect()
    }
    assert set(out) == {("A", "B"), ("B", "A")}
    ab, ba = out[("A", "B")], out[("B", "A")]
    assert ab.n_shared == ba.n_shared == 1  # exactly the planted gram
    # fraction denominators are per LEFT source
    assert ab.n_grams_a > ba.n_grams_a  # A has more distinct grams
    # overlap_frac is rounded to 6dp by the operator
    assert ab.overlap_frac == round(1.0 / ab.n_grams_a, 6)
    assert ba.overlap_frac == round(1.0 / ba.n_grams_a, 6)


def test_bloom_path_superset_of_exact(spark):
    """contaminated_docs_bloom flags a SUPERSET of the exact join path
    (fpp = over-flagging only, never a miss), and per-doc bloom counts
    are >= the exact matched-gram counts."""
    from anomalydetection_spark.operators.decontaminate import (
        contaminated_docs,
        contaminated_docs_bloom,
    )

    corpus = spark.createDataFrame(
        [(i, f"alpha beta gamma delta tail{i} x y z") for i in range(40)]
        + [(100 + i, f"clean{i} words only here nothing shared at all")
           for i in range(40)],
        "doc_id bigint, text string",
    )
    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon")], "id bigint, text string"
    )
    exact = {
        r.doc_id: r.n_matched_grams
        for r in contaminated_docs(corpus, bench).collect()
    }
    bloom = {
        r.doc_id: r.n_matched_grams
        for r in contaminated_docs_bloom(
            corpus, bench, fpp=0.01
        ).collect()
    }
    assert set(exact) <= set(bloom)
    for d, c in exact.items():
        assert bloom[d] >= c, (d, bloom[d], c)
    # the planted contaminated docs are all flagged on both paths
    assert all(i in exact for i in range(40))


def test_novelty_scores_planted(spark):
    from anomalydetection_spark.operators.decontaminate import (
        novelty_scores,
    )

    base = spark.createDataFrame(
        [(100, "alpha beta gamma delta")], "doc_id long, text string"
    )
    probe = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),   # fully covered -> 0.0
            (2, "omega psi chi phi"),        # fully novel -> 1.0
            (3, "alpha beta gamma omega"),   # 1 of 2 grams novel
            (4, "hi"),                       # < 3 tokens -> no grams
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in novelty_scores(probe, base, n=3).collect()
    }
    assert out[1]["novelty"] == 0.0
    assert out[2]["novelty"] == 1.0
    assert out[3]["n_grams"] == 2 and out[3]["n_novel"] == 1
    assert out[4]["n_grams"] == 0 and out[4]["novelty"] is None
