"""Round-4q: key and dependency discovery (operators/keys.py)."""

from __future__ import annotations

import pytest

from anomalydetection_spark.operators.keys import (
    afd_confidence,
    candidate_keys,
)


def _df(spark):
    rows = [
        # (id, dept, name, code): id unique; (dept,name) unique;
        # dept->code holds except one row; name has a null
        (1, "a", "x", 10),
        (2, "a", "y", 10),
        (3, "b", "x", 20),
        (4, "b", None, 99),
    ]
    return spark.createDataFrame(
        rows, "id long, dept string, name string, code int"
    )


def test_candidate_keys_unique_minimal_and_nulls(spark):
    out = {
        r["combo"]: r
        for r in candidate_keys(
            spark,
            _df(spark),
            [["id"], ["dept"], ["dept", "name"], ["id", "dept"]],
        ).collect()
    }
    assert out["id"]["is_unique"] and out["id"]["is_minimal_key"]
    assert not out["dept"]["is_unique"]
    # null name row excluded from the uniqueness base and reported
    dn = out["dept,name"]
    assert dn["n_withnull"] == 1 and dn["n_distinct"] == 3
    assert dn["is_unique"] and dn["is_minimal_key"]
    # superset of a unique combo: unique but not minimal
    idp = out["id,dept"]
    assert idp["is_unique"] and not idp["is_minimal_key"]


def test_candidate_keys_value_boundary_no_collision(spark):
    # ("ab","c") vs ("a","bc"): naive concat would merge them
    df = spark.createDataFrame(
        [(1, "ab", "c"), (2, "a", "bc")], "id long, x string, y string"
    )
    out = {
        r["combo"]: r
        for r in candidate_keys(spark, df, [["x", "y"]]).collect()
    }
    assert out["x,y"]["n_distinct"] == 2 and out["x,y"]["is_unique"]


def test_afd_g3_known_value(spark):
    # dept->code: group a keeps 2/2, group b keeps 1/2 -> g3 = 3/4
    out = {
        r["fd"]: r
        for r in afd_confidence(
            _df(spark), [("dept", "code"), ("id", "code")]
        ).collect()
    }
    dc = out["dept->code"]
    assert dc["confidence"] == 0.75 and not dc["holds"]
    assert dc["n_rows"] == 4 and dc["n_groups"] == 2
    ic = out["id->code"]
    assert ic["confidence"] == 1.0 and ic["holds"]


def test_afd_nulls_excluded(spark):
    # name->code: the null-name row drops from the base
    out = afd_confidence(_df(spark), [("name", "code")]).collect()[0]
    assert out["n_rows"] == 3


def test_empty_declarations_raise(spark):
    with pytest.raises(ValueError):
        candidate_keys(spark, _df(spark), [])
    with pytest.raises(ValueError):
        afd_confidence(_df(spark), [])
