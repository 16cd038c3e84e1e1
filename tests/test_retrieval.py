"""BM25 retrieval (operators/retrieval.py): scoring sanity, top-k
contract, and the zero-overlap exclusion."""

import math

from pyspark.sql import functions as F

from anomalydetection_spark.operators.retrieval import bm25_topk


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle partition spark shuffle"),
            (2, "spark only appears here once with filler words now"),
            (3, "totally unrelated content about cats and dogs"),
            (4, "partition partition partition shuffle spark core"),
        ],
        "doc_id bigint, text string",
    )


def _queries(spark):
    return spark.createDataFrame(
        [(0, ["spark", "shuffle", "partition"])],
        "query_id int, terms array<string>",
    )


def test_bm25_ranks_full_match_over_partial(spark):
    out = bm25_topk(_docs(spark), _queries(spark), k=10).collect()
    by_rank = {r.rank: r.doc_id for r in out}
    # docs 1 and 4 contain all three terms, doc 2 only one; doc 3 none
    assert set(by_rank.values()) == {1, 2, 4}
    assert by_rank[3] == 2  # single-term doc ranks last
    assert 3 not in {r.doc_id for r in out}  # zero overlap never scored


def test_bm25_k_bounds_output(spark):
    out = bm25_topk(_docs(spark), _queries(spark), k=1).collect()
    assert len(out) == 1 and out[0].rank == 1


def test_bm25_hand_computed_single_doc_corpus(spark):
    """One doc, one single-term query: score must equal the closed
    form idf=ln(1 + 0.5/1.5), tf-part = tf(k1+1)/(tf + k1) (dl=avgdl
    so the length normalization cancels)."""
    docs = spark.createDataFrame(
        [(7, "x x y")], "doc_id bigint, text string"
    )
    qs = spark.createDataFrame(
        [(0, ["x"])], "query_id int, terms array<string>"
    )
    out = bm25_topk(docs, qs, k=5).collect()
    assert len(out) == 1
    expected = math.log(1 + 0.5 / 1.5) * (2 * 2.2) / (2 + 1.2)
    assert abs(out[0].score - round(expected, 4)) < 1e-9


def test_bm25_multi_query_independent_ranking(spark):
    docs = _docs(spark)
    qs = spark.createDataFrame(
        [(0, ["spark"]), (1, ["cats"])],
        "query_id int, terms array<string>",
    )
    out = bm25_topk(docs, qs, k=10)
    cats = out.filter(F.col("query_id") == 1).collect()
    assert [r.doc_id for r in cats] == [3]
