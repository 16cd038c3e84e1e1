"""Snapshot row-diff (operators/diff.py) and the Deequ-family
entropy / mutual-information / reconciliation queries: planted-change
classification, column attribution, and closed-form information-theory
pins on a hand-built corpus."""

from __future__ import annotations

import datetime
import math

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.diff import diff_summary, snapshot_diff


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "o_orderkey bigint, o_status string, o_total double"
    )


def test_snapshot_diff_classifies_and_attributes(spark):
    left = _orders(
        spark,
        [
            (1, "O", 10.0),
            (2, "F", 20.0),
            (3, "O", 30.0),   # removed from right
            (4, "O", 40.0),
        ],
    )
    right = _orders(
        spark,
        [
            (1, "O", 10.0),   # unchanged
            (2, "X", 20.0),   # status changed
            (4, "F", 44.0),   # both columns changed
            (5, "O", 50.0),   # added
        ],
    )
    d = {
        r["o_orderkey"]: r
        for r in snapshot_diff(left, right, "o_orderkey").collect()
    }
    assert d[1].diff_status == "unchanged" and d[1].changed_cols == []
    assert d[2].diff_status == "changed"
    assert d[2].changed_cols == ["o_status"]
    assert d[3].diff_status == "removed" and d[3].changed_cols == []
    assert d[4].diff_status == "changed"
    assert d[4].changed_cols == ["o_status", "o_total"]
    assert d[5].diff_status == "added" and d[5].changed_cols == []


def test_snapshot_diff_null_safe_compare(spark):
    left = _orders(spark, [(1, None, 1.0), (2, None, 2.0)])
    right = _orders(spark, [(1, None, 1.0), (2, "O", 2.0)])
    d = {
        r["o_orderkey"]: r
        for r in snapshot_diff(left, right, "o_orderkey").collect()
    }
    # NULL == NULL under <=>: no phantom change
    assert d[1].diff_status == "unchanged"
    # NULL -> value IS a change
    assert d[2].diff_status == "changed"
    assert d[2].changed_cols == ["o_status"]


def test_diff_summary_rollup(spark):
    left = _orders(spark, [(1, "O", 1.0), (2, "O", 2.0), (3, "O", 3.0)])
    right = _orders(spark, [(1, "O", 1.0), (2, "X", 9.0), (4, "O", 4.0)])
    s = {
        (r.kind, r.name): r.n
        for r in diff_summary(
            snapshot_diff(left, right, "o_orderkey")
        ).collect()
    }
    assert s[("status", "unchanged")] == 1
    assert s[("status", "changed")] == 1
    assert s[("status", "removed")] == 1
    assert s[("status", "added")] == 1
    assert s[("column", "o_status")] == 1
    assert s[("column", "o_total")] == 1


def test_snapshot_diff_requires_compare_cols(spark):
    left = _orders(spark, [(1, "O", 1.0)]).select("o_orderkey")
    right = _orders(spark, [(1, "O", 1.0)]).select("o_orderkey")
    with pytest.raises(ValueError):
        snapshot_diff(left, right, "o_orderkey")


# -- closed-form information-theory pins ----------------------------------

_TS = datetime.datetime


@pytest.fixture(scope="module")
def planted_sf(spark, tmp_path_factory):
    """A tiny lineitem table with known entropy / MI structure:
    l_returnflag uniform {A,B}; l_linestatus 6:2 skewed and exactly
    independent of returnflag; l_linenumber functionally determines
    returnflag; ship month is a bijection with returnflag."""
    rows = [
        ("A", "X", 1, _TS(2024, 1, 5)),
        ("A", "X", 1, _TS(2024, 1, 6)),
        ("A", "X", 2, _TS(2024, 1, 7)),
        ("A", "Y", 2, _TS(2024, 1, 8)),
        ("B", "X", 3, _TS(2024, 2, 5)),
        ("B", "X", 3, _TS(2024, 2, 6)),
        ("B", "X", 4, _TS(2024, 2, 7)),
        ("B", "Y", 4, _TS(2024, 2, 8)),
    ]
    df = spark.createDataFrame(
        rows,
        "l_returnflag string, l_linestatus string, "
        "l_linenumber int, l_shipdate timestamp",
    )
    d = tmp_path_factory.mktemp("planted_sf")
    df.coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    return str(d)


def test_column_entropy_closed_form(spark, planted_sf):
    from anomalydetection_spark.queries import q_column_entropy

    e = {
        r.col: r for r in q_column_entropy(spark, planted_sf).collect()
    }
    ln2, ln4, ln8 = math.log(2), math.log(4), math.log(8)
    assert e["l_returnflag"].entropy == round(ln2, 6)
    assert e["l_returnflag"].norm_entropy == 1.0
    assert e["l_linenumber"].entropy == round(ln4, 6)
    assert e["l_linenumber"].n_distinct == 4
    # skewed 6:2 column: H = ln8 - (6 ln6 + 2 ln2)/8, norm < 1
    h = ln8 - (6 * math.log(6) + 2 * ln2) / 8
    assert e["l_linestatus"].entropy == round(h, 6)
    assert e["l_linestatus"].norm_entropy == round(h / ln2, 6)
    assert e["ship_month"].entropy == round(ln2, 6)


def test_mutual_information_closed_form(spark, planted_sf):
    from anomalydetection_spark.queries import q_mutual_information

    m = {
        r.pair: r for r in q_mutual_information(spark, planted_sf).collect()
    }
    # exactly independent by construction -> MI 0
    ind = m["l_returnflag__l_linestatus"]
    assert ind.mi == 0.0 and ind.nmi == 0.0
    # functional dependence -> MI = H(returnflag) = ln 2, NMI = 1
    fd = m["l_linenumber__l_returnflag"]
    assert fd.mi == round(math.log(2), 6)
    assert fd.nmi == 1.0
    bij = m["ship_month__l_returnflag"]
    assert bij.mi == round(math.log(2), 6)
    assert bij.nmi == 1.0


def test_order_reconciliation_planted_mismatch(spark, tmp_path):
    from anomalydetection_spark.queries import q_order_reconciliation

    orders = spark.createDataFrame(
        [
            (1, 100.0, "1-URGENT"),   # conserves
            (2, 105.0, "1-URGENT"),   # off by 5.00
            (3, 50.0, "2-HIGH"),      # no lineitems
        ],
        "o_orderkey bigint, o_totalprice double, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [
            (1, 50.0, 0.0, 0.0),
            (1, 50.0, 0.0, 0.0),
            (2, 100.0, 0.0, 0.0),
        ],
        "l_orderkey bigint, l_extendedprice double, "
        "l_discount double, l_tax double",
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    li.write.parquet(str(tmp_path / "lineitem.parquet"))
    out = {
        r.o_orderpriority: r
        for r in q_order_reconciliation(spark, str(tmp_path)).collect()
    }
    urgent = out["1-URGENT"]
    assert urgent.n_orders == 2
    assert urgent.n_mismatched == 1
    assert urgent.n_no_lineitems == 0
    assert urgent.max_abs_diff == 5.0
    high = out["2-HIGH"]
    assert high.n_no_lineitems == 1
    assert high.n_mismatched == 0


def test_join_diagnostics_counts(spark):
    """Hand-built fanout: left {1:2,2:1,3:1}, right {2:3,3:1,4:2} —
    matched keys {2,3}, exact join output 1*3+1*1=4, worst key 3."""
    from anomalydetection_spark.operators.diff import join_diagnostics

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "k bigint"
    )
    right = spark.createDataFrame(
        [(2,), (2,), (2,), (3,), (4,), (4,)], "j bigint"
    )
    r = join_diagnostics(left, right, "k", "j").first()
    assert (r.left_rows, r.right_rows) == (4, 6)
    assert (r.left_keys, r.right_keys, r.matched_keys) == (3, 3, 2)
    assert (r.left_only_keys, r.right_only_keys) == (1, 1)
    assert r.join_output_rows == 4
    assert r.max_key_output_rows == 3
    assert abs(r.left_row_coverage - 0.5) < 1e-9
    assert abs(r.right_row_coverage - 4 / 6) < 1e-6
    assert abs(r.fanout_per_left_row - 2.0) < 1e-9
    # the number it predicts is the number the join produces
    assert left.join(right, left.k == right.j).count() == r.join_output_rows


def test_join_diagnostics_empty_and_disjoint(spark):
    from anomalydetection_spark.operators.diff import join_diagnostics

    left = spark.createDataFrame([(1,), (2,)], "k bigint")
    right = spark.createDataFrame([(9,)], "k bigint")
    r = join_diagnostics(left, right, "k").first()
    assert r.matched_keys == 0 and r.join_output_rows == 0
    assert r.left_row_coverage == 0.0 and r.fanout_per_left_row == 0.0

    empty = spark.createDataFrame([], "k bigint")
    r2 = join_diagnostics(empty, right, "k").first()
    assert (r2.left_rows, r2.right_rows) == (0, 1)
    assert r2.join_output_rows == 0

    with pytest.raises(ValueError):
        join_diagnostics(left, right, ["k"], ["a", "b"])


def test_inclusion_dependencies_discovers_planted_fk(spark):
    """inclusion_dependencies: a clean FK surfaces at containment 1.0
    with exact=True, a partial overlap below the threshold is silent,
    int32/int64 candidates match through canonicalization, and a float
    candidate is rejected loudly."""
    import pytest

    from anomalydetection_spark.operators.inclusion import (
        inclusion_dependencies,
    )

    dims = spark.createDataFrame(
        [(i,) for i in range(10)], "dim_id int"
    )
    facts = spark.createDataFrame(
        [(i % 10, float(i)) for i in range(50)],
        "fk bigint, x double",
    )
    other = spark.createDataFrame(
        [(i,) for i in range(5, 25)], "mostly_outside int"
    )
    out = inclusion_dependencies(
        {"dims": dims, "facts": facts, "other": other},
        {"dims": ["dim_id"], "facts": ["fk"],
         "other": ["mostly_outside"]},
        min_containment=0.9,
    ).collect()
    got = {
        (r.from_table, r.from_column, r.to_table, r.to_column):
        (r.containment, r.exact)
        for r in out
    }
    # fk (int64) ⊆ dim_id (int32) through canonicalization, both ways
    assert got[("facts", "fk", "dims", "dim_id")] == (1.0, True)
    assert got[("dims", "dim_id", "facts", "fk")] == (1.0, True)
    # mostly_outside shares only 5/20 with dims -> silent; dims shares
    # 5/10 with mostly_outside -> silent
    assert not any(t == "other" or tt == "other"
                   for (t, _, tt, _) in got)

    with pytest.raises(ValueError, match="integral or string"):
        inclusion_dependencies(
            {"facts": facts}, {"facts": ["x"]}
        )
