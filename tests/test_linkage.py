"""Round-4q: Fellegi-Sunter record linkage
(operators/linkage.py::fellegi_sunter)."""

from __future__ import annotations

import math

import pytest

from anomalydetection_spark.operators.linkage import (
    LinkField,
    exact,
    fellegi_sunter,
    within,
)


def _people(spark):
    rows = [
        # block 1: 1<->2 near-duplicate entity, 3 unrelated
        (1, 1, "alice", "oak st", 100.0),
        (2, 1, "alice", "oak st", 140.0),
        (3, 1, "zed", "elm ave", 9000.0),
        # block 2: agree on nothing
        (4, 2, "bob", "pine rd", 5.0),
        (5, 2, "carol", "main st", 800.0),
        # block 2: null name never raises the score
        (6, 2, None, "main st", 810.0),
    ]
    return spark.createDataFrame(
        rows, "pid long, blk int, name string, addr string, bal double"
    )


FIELDS = [
    LinkField("name", exact("name"), 0.95, 0.05),
    LinkField("addr", exact("addr"), 0.90, 0.10),
    LinkField("bal", within("bal", 50.0), 0.80, 0.20),
]


def test_planted_duplicate_classified_match(spark):
    out = {
        (r["id_a"], r["id_b"]): r
        for r in fellegi_sunter(
            _people(spark), "pid", ["blk"], FIELDS, upper=2.0, lower=0.0
        ).collect()
    }
    r12 = out[(1, 2)]
    assert r12["match_class"] == "match"
    assert r12["agree_name"] and r12["agree_addr"] and r12["agree_bal"]
    expected = sum(math.log2(f.m / f.u) for f in FIELDS)
    assert abs(r12["score"] - expected) < 1e-9
    assert out[(1, 3)]["match_class"] == "non_match"
    assert out[(4, 5)]["match_class"] == "non_match"
    # cross-block pairs never materialize
    assert (1, 4) not in out and (3, 5) not in out


def test_null_field_counts_as_disagreement(spark):
    out = {
        (r["id_a"], r["id_b"]): r
        for r in fellegi_sunter(
            _people(spark), "pid", ["blk"], FIELDS
        ).collect()
    }
    r56 = out[(5, 6)]
    assert not r56["agree_name"]  # NULL name: no evidence, no credit
    assert r56["agree_addr"] and r56["agree_bal"]


def test_possible_band_between_thresholds(spark):
    # agree on addr+bal but not name: score = -w_name + w_addr + w_bal
    rows = [
        (1, 1, "ann", "oak st", 100.0),
        (2, 1, "anne", "oak st", 120.0),
    ]
    df = spark.createDataFrame(
        rows, "pid long, blk int, name string, addr string, bal double"
    )
    s = (
        math.log2(0.05 / 0.95)
        + math.log2(0.90 / 0.10)
        + math.log2(0.80 / 0.20)
    )
    out = fellegi_sunter(
        df, "pid", ["blk"], FIELDS, upper=s + 0.5, lower=s - 0.5
    ).collect()[0]
    assert out["match_class"] == "possible"
    assert abs(out["score"] - s) < 1e-9


def test_invalid_priors_raise(spark):
    with pytest.raises(ValueError, match="0 < u < m < 1"):
        fellegi_sunter(
            _people(spark),
            "pid",
            ["blk"],
            [LinkField("bad", exact("name"), 0.2, 0.9)],
        ).collect()


def test_sorted_neighborhood_adjacent_typo_found(spark):
    """Equality blocking on the name would separate 'jon'/'john'; a
    name sort key keeps them adjacent so SN pairs them."""
    from anomalydetection_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "john"), (2, "jon"), (3, "jonathan"),
        (4, "zara"), (5, "zora"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "id", F.col("name"), window=1
        ).collect()
    }
    # sort order: john, jon, jonathan, zara, zora
    assert pairs == {(1, 2), (2, 3), (3, 4), (4, 5)}


def test_sorted_neighborhood_partitions_do_not_cross(spark):
    from anomalydetection_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )
    from pyspark.sql import functions as F

    rows = [(1, "x", 1.0), (2, "x", 2.0), (3, "y", 1.5), (4, "y", 2.5)]
    df = spark.createDataFrame(rows, "id long, p string, v double")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, "id", F.col("v"), window=2, partition_expr=F.col("p")
        ).collect()
    }
    assert pairs == {(1, 2), (3, 4)}


def test_sorted_neighborhood_window_width(spark):
    from anomalydetection_spark.operators.linkage import (
        sorted_neighborhood_pairs,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i, float(i)) for i in range(6)], "id long, v double")
    out = sorted_neighborhood_pairs(df, "id", F.col("v"), window=2)
    assert out.count() == 5 + 4  # distance-1 and distance-2 chains


def test_fs_fit_em_recovers_planted_structure(spark):
    """Two planted populations: 10% 'true matches' agree on both
    fields ~90% of the time; non-matches agree ~10%/20%. EM from a
    generic init should recover m >> u per field and a match rate
    near the planted 10%."""
    import itertools

    rows = []
    x = 99991
    def rnd():
        nonlocal x
        x = (x * 1103515245 + 12345) % (2**31)
        return (x >> 7) % 1000 / 1000.0
    for i in range(3000):
        is_match = rnd() < 0.10
        if is_match:
            a1, a2 = rnd() < 0.9, rnd() < 0.85
        else:
            a1, a2 = rnd() < 0.1, rnd() < 0.2
        rows.append((a1, a2))
    df = spark.createDataFrame(rows, "f1 boolean, f2 boolean")
    from anomalydetection_spark.operators.linkage import fs_fit_em

    fit = fs_fit_em(df, ["f1", "f2"], iters=50)
    (m1, u1), (m2, u2) = fit["fields"]["f1"], fit["fields"]["f2"]
    assert m1 > 0.7 > 0.3 > u1
    assert m2 > 0.6 > 0.35 > u2
    assert 0.03 < fit["match_rate"] < 0.25
    assert fit["n_pairs"] == 3000
    # fitted values are valid LinkField priors
    from anomalydetection_spark.operators.linkage import LinkField

    LinkField("f1", "a_x = b_x", m1, u1).weights()


def test_fs_fit_em_empty_raises(spark):
    import pytest as _pytest

    from anomalydetection_spark.operators.linkage import fs_fit_em

    df = spark.createDataFrame([], "f1 boolean")
    with _pytest.raises(ValueError, match="no candidate pairs"):
        fs_fit_em(df, ["f1"])
