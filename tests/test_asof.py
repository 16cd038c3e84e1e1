"""As-of join operator (operators/asof.py) vs hand-known answers."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.asof import asof_join


def _tables(spark):
    trades = spark.createDataFrame(
        [(1, 10, "t10"), (1, 20, "t20"), (2, 15, "t15"), (3, 7, "t7")],
        "uid long, t long, tag string",
    )
    quotes = spark.createDataFrame(
        [(1, 5, 100.0), (1, 10, 110.0), (1, 18, 120.0), (2, 99, 130.0)],
        "uid long, t long, px double",
    )
    return trades, quotes


def test_asof_semantics_inclusive_and_unmatched(spark):
    trades, quotes = _tables(spark)
    out = {
        (r.uid, r.t): (r.px_asof, r.t_asof)
        for r in asof_join(
            trades, quotes, "uid", "t", "t", ["px"]
        ).collect()
    }
    assert out[(1, 10)] == (110.0, 10)   # tie at t=10 matches inclusively
    assert out[(1, 20)] == (120.0, 18)   # latest at-or-before
    assert out[(2, 15)] == (None, None)  # only future quote → unmatched
    assert out[(3, 7)] == (None, None)   # key absent on right


def test_asof_left_columns_survive_and_one_row_per_left(spark):
    trades, quotes = _tables(spark)
    out = asof_join(trades, quotes, "uid", "t", "t", ["px"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"uid", "t", "tag", "px_asof", "t_asof"}


def test_asof_single_shuffle_plan(spark):
    """The union-sort-fill plan must cost exactly one hash exchange on
    the key — that is the operator's whole reason to exist."""
    trades, quotes = _tables(spark)
    plan = (
        asof_join(trades, quotes, "uid", "t", "t", ["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("hashpartitioning") == 1


def test_range_join_matches_naive_between(spark):
    """Bucketed plan == naive BETWEEN join on a fixture whose
    intervals straddle bucket boundaries (incl. zero-match interval),
    and the physical plan is a hash join, not a nested loop."""
    from anomalydetection_spark.operators.asof import range_join

    points = spark.createDataFrame(
        [(i, v) for i, v in enumerate([0, 49, 50, 99, 100, 149, 777])],
        "pid long, v long",
    )
    iv = spark.createDataFrame(
        [(1, 40, 89), (2, 0, 49), (3, 900, 949), (4, 95, 144)],
        "iid long, lo long, hi long",
    )
    got = {
        (r.pid, r.iid)
        for r in range_join(points, iv, "v", "lo", "hi", 50).collect()
    }
    naive = {
        (r.pid, r.iid)
        for r in points.join(
            iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    assert got == naive and got  # non-empty and identical
    plan = (
        range_join(points, iv, "v", "lo", "hi", 50)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_stratified_sample_exact_counts_and_determinism(spark):
    from anomalydetection_spark.operators.sample import stratified_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(100)] + [(1000, "tiny")],
        "doc_id long, source string",
    )
    out = stratified_sample(df, "source", "doc_id", 7)
    counts = {
        r.source: r.n
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert counts == {"s0": 7, "s1": 7, "s2": 7, "tiny": 1}
    a = sorted((r.source, r.doc_id, r.sample_rank) for r in out.collect())
    b = sorted(
        (r.source, r.doc_id, r.sample_rank)
        for r in stratified_sample(
            df.repartition(7), "source", "doc_id", 7
        ).collect()
    )
    assert a == b  # partitioning-independent selection


def test_range_join_rejects_ambiguous_columns(spark):
    import pytest

    from anomalydetection_spark.operators.asof import range_join

    pts = spark.createDataFrame([(1, 5)], "id long, v long")
    iv = spark.createDataFrame([(1, 0, 9)], "id long, lo long, hi long")
    with pytest.raises(ValueError, match="overlapping column names"):
        range_join(pts, iv, "v", "lo", "hi", 10)


def test_asof_null_value_in_matched_row_stays_null(spark):
    """The matched right row travels as one struct: a NULL px inside
    the winning row must NOT be backfilled from an older right row."""
    trades = spark.createDataFrame([(1, 6)], "uid long, t long")
    quotes = spark.createDataFrame(
        [(1, 3, 7.0), (1, 5, None)], "uid long, t long, px double"
    )
    r = asof_join(trades, quotes, "uid", "t", "t", ["px"]).first()
    assert r.t_asof == 5 and r.px_asof is None


def test_asof_null_keys_never_match(spark):
    trades = spark.createDataFrame(
        [(None, 10), (1, 10)], "uid long, t long"
    )
    quotes = spark.createDataFrame(
        [(None, 5, 1.0), (1, 5, 2.0)], "uid long, t long, px double"
    )
    out = {r.uid: r.px_asof for r in
           asof_join(trades, quotes, "uid", "t", "t", ["px"]).collect()}
    assert out[1] == 2.0
    assert out[None] is None  # null key: unmatched, like SQL equality


def test_asof_rejects_reserved_left_columns(spark):
    import pytest

    left = spark.createDataFrame([(1, 5, 0.0)], "uid long, t long, px_asof double")
    right = spark.createDataFrame([(1, 3, 1.0)], "uid long, t long, px double")
    with pytest.raises(ValueError, match="reserved column names"):
        asof_join(left, right, "uid", "t", "t", ["px"])


def test_chunk_documents_windows_and_reconstruction(spark):
    """Non-overlapping chunks concatenate back to the original text;
    overlapping stride produces the expected window starts/lengths."""
    from anomalydetection_spark.operators.sample import chunk_documents

    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x")], "doc_id long, text string"
    )
    solid = chunk_documents(df, chunk_tokens=3).collect()
    by_doc: dict[int, list] = {}
    for r in solid:
        by_doc.setdefault(r.doc_id, []).append(r)
    one = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    assert [r.chunk_text for r in one] == ["a b c", "d e f", "g"]
    assert [r.n_tokens for r in one] == [3, 3, 1]
    assert " ".join(r.chunk_text for r in one) == "a b c d e f g"
    assert [(r.chunk_text, r.n_tokens) for r in by_doc[2]] == [("x", 1)]

    sliding = sorted(
        (r.chunk_idx, r.chunk_text)
        for r in chunk_documents(
            df.filter(F.col("doc_id") == 1), chunk_tokens=4, stride=2
        ).collect()
    )
    assert sliding == [
        (0, "a b c d"), (1, "c d e f"), (2, "e f g"), (3, "g"),
    ]


def test_mixture_sample_monotone_and_deterministic(spark):
    """Raising a stratum's fraction only ADDS rows (monotone
    selection), 1.0 keeps everything, 0.0/default drops everything,
    and the selection is reproducible."""
    from anomalydetection_spark.operators.sample import (
        stratified_sample_frac,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(400)],
        "doc_id long, source string",
    )
    lo = {r.doc_id for r in
          stratified_sample_frac(df, "source", "doc_id", {"a": 0.2}).collect()}
    hi = {r.doc_id for r in
          stratified_sample_frac(df, "source", "doc_id", {"a": 0.6}).collect()}
    assert lo <= hi and 0 < len(lo) < len(hi) < 200
    assert all(i % 2 == 0 for i in hi)  # stratum b defaulted to 0.0
    full = stratified_sample_frac(
        df, "source", "doc_id", {"a": 1.0, "b": 1.0}
    ).count()
    assert full == 400
    again = {r.doc_id for r in
             stratified_sample_frac(df, "source", "doc_id", {"a": 0.2}).collect()}
    assert again == lo


def test_pack_chunks_budget_and_conservation(spark):
    from anomalydetection_spark.operators.sample import (
        chunk_documents,
        pack_chunks,
    )

    docs = spark.createDataFrame(
        [(i, "g%d" % (i % 2), "w " * (5 + i % 7)) for i in range(40)],
        "doc_id long, grp string, text string",
    )
    chunks = chunk_documents(docs, chunk_tokens=4).join(
        docs.select("doc_id", "grp"), "doc_id"
    )
    packed = pack_chunks(
        chunks, "grp", ["doc_id", "chunk_idx"], budget=10
    )
    rows = packed.collect()
    assert len(rows) == chunks.count()  # every chunk packed exactly once
    sums: dict = {}
    for r in rows:
        sums.setdefault((r.grp, r.pack_id), []).append(r.n_tokens)
    for (_, _), toks in sums.items():
        assert sum(toks) <= 10 or len(toks) == 1  # budget or lone giant
    # deterministic
    again = {
        (r.grp, r.doc_id, r.chunk_idx): r.pack_id
        for r in pack_chunks(
            chunks.repartition(5), "grp", ["doc_id", "chunk_idx"], budget=10
        ).collect()
    }
    first = {
        (r.grp, r.doc_id, r.chunk_idx): r.pack_id for r in rows
    }
    assert again == first


def test_asof_matches_pandas_merge_asof_randomized(spark):
    """Randomized cross-check against pandas.merge_asof (an
    independent third implementation of as-of semantics, beside the
    DuckDB ASOF oracle): 4 seeded datasets with collisions between
    keys, out-of-range times, and unmatched keys."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2, 3):
        rng = np.random.RandomState(seed)
        n_l, n_r = 120, 90
        lt = pd.DataFrame(
            {
                "uid": rng.randint(0, 8, n_l),
                "t": rng.randint(0, 1000, n_l),
            }
        )
        lt["lid"] = np.arange(n_l)
        rt = pd.DataFrame(
            {
                "uid": rng.randint(0, 10, n_r),
                "t": rng.randint(0, 1000, n_r),
                "px": rng.rand(n_r).round(6),
            }
        ).drop_duplicates(["uid", "t"])  # unique right times per key
        expected = pd.merge_asof(
            lt.sort_values("t", kind="mergesort"),
            rt.sort_values("t", kind="mergesort"),
            on="t",
            by="uid",
            direction="backward",
            suffixes=("", "_r"),
        ).set_index("lid")
        got = {
            r.lid: r.px_asof
            for r in asof_join(
                spark.createDataFrame(lt, "uid long, t long, lid long"),
                spark.createDataFrame(rt, "uid long, t long, px double"),
                "uid", "t", "t", ["px"],
            ).collect()
        }
        assert len(got) == n_l, seed
        for lid, exp_px in expected["px"].items():
            g = got[lid]
            if pd.isna(exp_px):
                assert g is None, (seed, lid)
            else:
                assert g is not None and abs(g - exp_px) < 1e-12, (seed, lid)


def test_range_join_matches_naive_randomized(spark):
    """Randomized bucketed-vs-naive BETWEEN equivalence across bucket
    widths that divide, straddle, and exceed the interval spans."""
    import numpy as np

    rng = np.random.RandomState(7)
    pts = [(int(i), int(v)) for i, v in enumerate(rng.randint(0, 500, 300))]
    ivs = []
    for i in range(60):
        lo = int(rng.randint(0, 480))
        ivs.append((i, lo, lo + int(rng.randint(0, 90))))
    from anomalydetection_spark.operators.asof import range_join

    p = spark.createDataFrame(pts, "pid long, v long")
    iv = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    naive = {
        (r.pid, r.iid)
        for r in p.join(
            iv, (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
        ).collect()
    }
    for width in (7, 50, 128, 1000):
        got = {
            (r.pid, r.iid)
            for r in range_join(p, iv, "v", "lo", "hi", width).collect()
        }
        assert got == naive, width
