"""Duplicated n-gram span scrubbing (operators/scrub.py) and
token-budget mixture planning (operators/sample.py plan_mixture)."""

from __future__ import annotations

import pytest

from anomalydetection_spark.operators.sample import plan_mixture
from anomalydetection_spark.operators.scrub import scrub_duplicated_ngrams


BOILER = "all rights reserved contact the site administrator today"  # 8 toks


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_scrub_removes_shared_span_exactly(spark):
    rows = [
        (1, f"alpha beta {BOILER} gamma delta"),
        (2, f"{BOILER} epsilon zeta"),
        (3, "totally unrelated words here nothing shared at all ok"),
    ]
    out = _by_id(scrub_duplicated_ngrams(_docs(spark, rows), n=8, min_docs=2))
    assert out[1]["scrubbed_text"] == "alpha beta gamma delta"
    assert out[1]["n_tokens"] == 12 and out[1]["n_removed"] == 8
    # span at position 1 (doc start boundary)
    assert out[2]["scrubbed_text"] == "epsilon zeta"
    assert out[2]["n_removed"] == 8
    assert out[3]["n_removed"] == 0
    assert out[3]["scrubbed_text"] == rows[2][1]


def test_scrub_overlapping_spans_union_coverage(spark):
    # Two docs share a 9-token run -> two overlapping frequent
    # 8-grams; coverage is their UNION (9 tokens), not 16.
    run = "one two three four five six seven eight nine"
    rows = [(1, f"{run} taila done"), (2, f"headb {run} other")]
    out = _by_id(scrub_duplicated_ngrams(_docs(spark, rows), n=8, min_docs=2))
    assert out[1]["n_removed"] == 9
    assert out[1]["scrubbed_text"] == "taila done"
    assert out[2]["n_removed"] == 9
    assert out[2]["scrubbed_text"] == "headb other"


def test_scrub_short_docs_and_within_doc_repeat_untouched(spark):
    rows = [
        (1, "short doc"),  # < n tokens: no shingles, never scrubbed
        # the same 8-gram twice in ONE doc: min_docs counts DISTINCT
        # docs, so self-repetition is out of scope (repetition_ratio
        # owns that signal)
        (2, f"{BOILER} {BOILER}"),
    ]
    out = _by_id(scrub_duplicated_ngrams(_docs(spark, rows), n=8, min_docs=2))
    assert out[1]["n_removed"] == 0
    assert out[2]["n_removed"] == 0


def test_scrub_hash_and_string_paths_identical(spark):
    """xxhash64-keyed frequency exchange (the 10^12-doc shuffle
    shape) must decide exactly the spans the string-keyed path
    decides on the sf0.001 documents corpus (planted duplicates)."""
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = (
        scrub_duplicated_ngrams(d, n=8, min_docs=2, hash_shingles=True)
        .orderBy("doc_id")
        .collect()
    )
    b = (
        scrub_duplicated_ngrams(d, n=8, min_docs=2, hash_shingles=False)
        .orderBy("doc_id")
        .collect()
    )
    assert a == b
    assert any(r["n_removed"] > 0 for r in a)  # corpus has planted dups


def test_scrub_ratio_and_full_removal(spark):
    rows = [(1, BOILER), (2, BOILER)]
    out = _by_id(scrub_duplicated_ngrams(_docs(spark, rows), n=8, min_docs=2))
    for i in (1, 2):
        assert out[i]["n_removed"] == 8
        assert out[i]["removed_ratio"] == 1.0
        assert out[i]["scrubbed_text"] == ""


def test_plan_mixture_rates_and_short_verdict(spark):
    rows = [
        (1, "a b c d e", "web"),   # 5 tokens
        (2, "f g h i j", "web"),   # web: 10 tokens
        (3, "k l", "wiki"),        # wiki: 2 tokens
        (4, "m n o", "books"),     # books: 3 tokens, no weight
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["source"]: r.asDict()
        for r in plan_mixture(
            df, {"web": 0.5, "wiki": 0.5}, token_budget=10
        ).collect()
    }
    web = out["web"]
    assert web["tokens_available"] == 10 and web["target_tokens"] == 5
    assert web["sample_rate"] == 0.5 and web["expected_tokens"] == 5
    assert web["verdict"] == "ok"
    wiki = out["wiki"]
    # wants 5, has 2: rate caps at 1.0 and the source is 'short'
    assert wiki["sample_rate"] == 1.0 and wiki["expected_tokens"] == 2
    assert wiki["verdict"] == "short"
    books = out["books"]
    assert books["weight"] == 0.0 and books["sample_rate"] == 0.0
    assert books["expected_tokens"] == 0 and books["verdict"] == "ok"


def test_scrub_plan_no_expand_one_wide_exchange(spark):
    """The only row-scale exchange is the shingle-frequency groupBy
    (+ its distinct-count second level and the bounded per-doc starts
    fold); the coverage rebuild is row-local HOFs, no Python UDFs."""
    import io
    from contextlib import redirect_stdout

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with redirect_stdout(buf):
        scrub_duplicated_ngrams(d, n=8).explain("formatted")
    plan = buf.getvalue()
    assert "PythonUDF" not in plan and "BatchEvalPython" not in plan
