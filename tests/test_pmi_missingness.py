"""Planted-fixture tests for the round-4l analytics queries:
token_pmi (bigram collocations) and null_cooccurrence (missingness
co-occurrence audit)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F


def _docs(spark, texts, tmp_path):
    df = spark.createDataFrame(
        [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def _events(spark, n, tmp_path):
    df = spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), i % 5,
             "T", float(i), "x")
            for i in range(n)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_token_pmi_planted(spark, tmp_path):
    # "new york" is a perfect collocation: 'new' and 'york' occur ONLY
    # as the adjacent pair, 5 times.  Filler 'the' pads the unigram
    # total without forming any >=5-count bigram of its own beyond
    # 'the the' runs, which we avoid by alternating fillers.
    texts = ["new york %s b%d c%d" % ("the", i, i) for i in range(5)]
    sf = _docs(spark, texts, tmp_path)
    from anomalydetection_spark.queries import q_token_pmi

    got = {(r.w1, r.w2): r for r in q_token_pmi(spark, sf).collect()}
    # every doc: 5 tokens -> 25 unigrams, 20 bigrams total.
    # only ('new','york') and ('york','the') reach count 5.
    assert set(got) == {("new", "york"), ("york", "the")}
    r = got[("new", "york")]
    assert r.c_ab == 5
    # c1 = c2 = 5, n_tok = 25, n_bi = 20
    exp = math.log((5 / 20) * (25 / 5) * (25 / 5))
    assert abs(r.pmi - exp) < 1e-6
    # 'the' is as frequent but only ever follows 'york' -> lower PMI
    assert got[("york", "the")].pmi == r.pmi  # same counts here
    # and a higher-frequency second word WOULD lower PMI: sanity via
    # the closed form (c2 doubling halves the ratio)
    assert abs(
        (math.log((5 / 20) * (25 / 5) * (25 / 10))) - (exp - math.log(2))
    ) < 1e-12


def test_token_pmi_min_count_floor(spark, tmp_path):
    # bigrams occurring < 5 times are excluded entirely.
    texts = ["alpha beta gamma delta"] * 4
    sf = _docs(spark, texts, tmp_path)
    from anomalydetection_spark.queries import q_token_pmi

    assert q_token_pmi(spark, sf).count() == 0


def test_null_cooccurrence_planted(spark, tmp_path):
    n = 1001
    sf = _events(spark, n, tmp_path)
    from anomalydetection_spark.queries import q_null_cooccurrence

    got = {
        (r.col_a, r.col_b): r
        for r in q_null_cooccurrence(spark, sf).collect()
    }
    assert set(got) == {
        ("value", "props"),
        ("value", "event_type"),
        ("props", "event_type"),
    }
    # replay the synthesis arithmetic exactly
    na = sum(1 for i in range(n) if i % 7 == 0)
    nb = sum(1 for i in range(n) if i % 7 == 0 or i % 11 == 3)
    nc = sum(1 for i in range(n) if i % 13 == 5)
    nab = sum(1 for i in range(n) if i % 7 == 0)  # props ⊇ value nulls
    nac = sum(1 for i in range(n) if i % 7 == 0 and i % 13 == 5)
    r = got[("value", "props")]
    assert (r.n_a, r.n_b, r.n_both) == (na, nb, nab)
    # planted correlation: props is null WHENEVER value is ->
    # jaccard = na/nb and lift = n/nb > 1
    assert abs(r.jaccard - na / nb) < 1e-6
    assert abs(r.lift - n / nb) < 1e-6
    assert r.lift > 1.5
    # the independent pair sits near lift 1 (exact arithmetic check)
    r2 = got[("value", "event_type")]
    assert (r2.n_a, r2.n_b, r2.n_both) == (na, nc, nac)
    exp_lift = nac * n / (na * nc)
    assert abs(r2.lift - exp_lift) < 1e-6
    assert 0.5 < r2.lift < 1.5


def test_null_cooccurrence_all_nonnull_guarded(spark, tmp_path):
    # a single row with event_id=1 hits none of the null strata:
    # every count is 0 and jaccard/lift are NULL, not a crash.
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 0, "T", 1.0, "x")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.parquet(str(tmp_path / "events.parquet"))
    from anomalydetection_spark.queries import q_null_cooccurrence

    rows = q_null_cooccurrence(spark, str(tmp_path)).collect()
    assert len(rows) == 3
    for r in rows:
        assert (r.n_a, r.n_b, r.n_both) == (0, 0, 0)
        assert r.jaccard is None and r.lift is None
