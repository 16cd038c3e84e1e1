"""Round-4h additions: exact set-similarity join with lossless prefix
filtering (operators/dedup.py::setsim_prefix_pairs), plus the
gaps-and-islands catalog queries (coverage_gaps, scd2_intervals,
k_anonymity) on planted fixtures."""

from __future__ import annotations

import datetime as dt
import itertools

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.dedup import (
    default_tokenizer,
    setsim_prefix_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _brute_pairs(texts, tau):
    """Ground-truth all-pairs Jaccard >= tau over distinct whitespace
    tokens (the operator's raw-ratio contract)."""
    toks = [set(t.lower().strip().split(" ")) for t in texts]
    out = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        inter = len(toks[a] & toks[b])
        uni = len(toks[a] | toks[b])
        if uni and inter / uni >= tau:
            out.add((a, b))
    return out


PLANTED = [
    "the quick brown fox jumps over the lazy dog tonight",
    "the quick brown fox jumps over the lazy dog today",   # near-dup of 0
    "pack my box with five dozen liquor jugs right now",
    "pack my box with five dozen liquor jugs right here",  # near-dup of 2
    "completely unrelated text about spark shuffles and skew",
    "the quick brown fox jumps over the lazy dog tonight",  # exact dup of 0
]


@pytest.mark.parametrize("order", ["df", "hash"])
def test_setsim_matches_brute_force(spark, order):
    for tau in (0.6, 0.8, 0.85):
        got = {
            (r.a_id, r.b_id)
            for r in setsim_prefix_pairs(
                _docs(spark, PLANTED), threshold=tau, order=order
            ).collect()
        }
        assert got == _brute_pairs(PLANTED, tau), (tau, order)


def test_setsim_lossless_on_adversarial_sizes(spark):
    """Documents whose token counts sit exactly at ceil boundaries
    (m where tau*m is integer) — the case a float-rounded prefix
    length would silently lose."""
    tau = 0.8
    # m=20 docs sharing exactly 17 tokens: J = 17/23 < 0.8 (excluded);
    # m=20 sharing 19: J = 19/21 >= 0.8 (must be found)
    base = [f"t{i}" for i in range(19)]
    texts = [
        " ".join(base + ["a0"]),          # doc 0: 20 tokens
        " ".join(base + ["b0"]),          # doc 1: 19 shared -> J=19/21
        " ".join(base[:17] + ["c0", "c1", "c2"]),  # 17 shared -> J=17/23
    ]
    got = {
        (r.a_id, r.b_id, r.jaccard)
        for r in setsim_prefix_pairs(
            _docs(spark, texts), threshold=tau
        ).collect()
    }
    assert (0, 1, round(19 / 21, 4)) in got
    assert all(p[:2] != (0, 2) for p in got)
    expected = {
        (
            a,
            b,
            round(
                len(set(texts[a].split()) & set(texts[b].split()))
                / len(set(texts[a].split()) | set(texts[b].split())),
                4,
            ),
        )
        for a, b in _brute_pairs(texts, tau)
    }
    assert got == expected


def test_setsim_empty_and_null_text(spark):
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, None), (3, "")],
        "doc_id long, text string",
    )
    got = {
        (r.a_id, r.b_id)
        for r in setsim_prefix_pairs(df, threshold=0.5).collect()
    }
    # null text drops (no token set); empty text tokenizes to [""] and
    # matches nothing at tau=0.5 except another empty
    assert got == {(0, 1)}


def test_setsim_prefix_index_is_smaller_than_full_index(spark):
    """The scale contract: the candidate-generation index holds only
    m - ceil(tau*m) + 1 tokens per doc, not m."""
    texts = [" ".join(f"w{i}{j}" for j in range(20)) for i in range(10)]
    df = _docs(spark, texts)
    tok_total = df.select(
        F.sum(F.size(default_tokenizer("text")))
    ).collect()[0][0]
    # reconstruct the operator's prefix length at tau=0.85, m=20 -> 4
    assert tok_total == 200
    pairs = setsim_prefix_pairs(df, threshold=0.85)
    assert pairs.count() == 0  # disjoint vocabularies -> no pairs
    # the plan should scan/explode only 4 tokens per doc in the join:
    # verified structurally — slice(toks_ord, 1, p) appears in the plan
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "slice" in plan


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (eid, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h, seconds=s), u, k)
            for eid, h, s, u, k in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


def test_coverage_gaps_planted(spark, tmp_path):
    # type A: hours 0,1,5 -> one gap [2,4] of 3h; type B: 0,1,2 -> none
    rows = [
        (1, 0, 0, 1, "A"), (2, 1, 30, 1, "A"), (3, 5, 0, 1, "A"),
        (4, 0, 0, 1, "B"), (5, 1, 0, 1, "B"), (6, 2, 59, 1, "B"),
    ]
    ev = _events(spark, rows).withColumn("value", F.lit(0.0)).withColumn(
        "props", F.lit(None).cast("string")
    )
    p = str(tmp_path / "events.parquet")
    ev.write.parquet(p)
    from anomalydetection_spark.queries import q_coverage_gaps

    got = q_coverage_gaps(spark, str(tmp_path)).collect()
    assert len(got) == 1
    g = got[0]
    assert g.event_type == "A" and g.gap_hours == 3
    assert g.gap_start == dt.datetime(2024, 1, 1, 2)
    assert g.gap_end == dt.datetime(2024, 1, 1, 4)


def test_scd2_intervals_planted(spark, tmp_path):
    # user 1: A(h0), A(h1), B(h2), A(h3) -> 3 intervals A,B,A
    # ties: user 2 has two different states at the SAME ts -> event_id
    # breaks the tie deterministically
    rows = [
        (1, 0, 0, 1, "A"), (2, 1, 0, 1, "A"), (3, 2, 0, 1, "B"), (4, 3, 0, 1, "A"),
        (10, 0, 0, 2, "X"), (11, 0, 0, 2, "Y"),
    ]
    ev = _events(spark, rows).withColumn("value", F.lit(0.0)).withColumn(
        "props", F.lit(None).cast("string")
    )
    ev.write.parquet(str(tmp_path / "events.parquet"))
    from anomalydetection_spark.queries import q_scd2_intervals

    got = sorted(
        q_scd2_intervals(spark, str(tmp_path)).collect(),
        key=lambda r: (r.user_id, r.valid_from, r.state),
    )
    u1 = [(r.state, r.valid_from, r.valid_to, r.n_events) for r in got if r.user_id == 1]
    h = lambda k: dt.datetime(2024, 1, 1, k)  # noqa: E731
    assert u1 == [
        ("A", h(0), h(2), 2),
        ("B", h(2), h(3), 1),
        ("A", h(3), None, 1),
    ]
    u2 = [(r.state, r.valid_to) for r in got if r.user_id == 2]
    # event_id order: X (id 10) then Y (id 11); X's interval closes at
    # the SAME timestamp Y's opens (zero-duration history rows are the
    # standard SCD2 representation of same-instant changes)
    assert u2 == [("X", h(0)), ("Y", None)]


def test_k_anonymity_planted(spark, tmp_path):
    rows = (
        [(i, f"c{i}", 1, 500.0, "SEG_A") for i in range(10)]  # group of 10: safe
        + [(100 + i, f"r{i}", 2, 1500.0, "SEG_B") for i in range(3)]  # 3 < k
    )
    spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    from anomalydetection_spark.queries import q_k_anonymity

    got = q_k_anonymity(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.mktsegment, r.nationkey, r.bal_bucket, r.group_size) == (
        "SEG_B", 2, 1, 3,
    )


def test_shingle_tokenizer_semantics(spark):
    """Shingle parity with the SQL form the DuckDB oracle uses: split
    on single space keeping empties, strip spaces only, whole-text
    shingle for short docs, NULL text -> NULL (dropped by m > 0)."""
    from anomalydetection_spark.operators.dedup import shingle_tokenizer

    df = spark.createDataFrame(
        [
            (0, "A b c d"),            # 2 trigram shingles, lowercased
            (1, "  one two  "),        # < 3 words -> whole trimmed text
            (2, "x"),                  # single word -> itself
            (3, None),                 # NULL -> NULL toks
            (4, "r r r r"),            # repeated shingle deduped
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.toks
        for r in df.select(
            "doc_id", shingle_tokenizer(3)("text").alias("toks")
        ).collect()
    }
    assert got[0] == ["a b c", "b c d"]
    assert got[1] == ["one two"]
    assert got[2] == ["x"]
    assert got[3] is None
    assert got[4] == ["r r r"]


def test_setsim_shingled_brute_force(spark):
    """Lossless prefix filtering holds under the shingle tokenizer:
    the operator's pairs equal brute-force all-pairs shingle-Jaccard."""
    from anomalydetection_spark.operators.dedup import (
        setsim_prefix_pairs,
        shingle_tokenizer,
    )

    def sh3(t):
        w = t.strip(" ").lower().split(" ")
        if len(w) >= 3:
            return set(" ".join(w[i : i + 3]) for i in range(len(w) - 2))
        return {" ".join(w)}

    texts = PLANTED + ["the quick brown fox leaps over the lazy dog tonight"]
    want = set()
    for a, b in itertools.combinations(range(len(texts)), 2):
        ta, tb = sh3(texts[a]), sh3(texts[b])
        if len(ta | tb) and len(ta & tb) / len(ta | tb) >= 0.5:
            want.add((a, b))
    got = {
        (r.a_id, r.b_id)
        for r in setsim_prefix_pairs(
            _docs(spark, texts),
            threshold=0.5,
            tokenizer=shingle_tokenizer(3),
        ).collect()
    }
    assert got == want and want  # non-trivial fixture
