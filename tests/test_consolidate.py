"""Golden-record consolidation (operators/consolidate.py): planted
clusters exercise every survivorship policy's deterministic tie-break
and null behavior, and mode fields keep their original type through
the stacked string long-form."""

from __future__ import annotations

import pytest

from anomalydetection_spark.operators.consolidate import golden_records


def _frame(spark):
    rows = [
        # cluster 1: mode tie between 'b' (2x) and 'a' (2x) -> 'b'
        # (string-wise largest at the winning count); longest tie
        # between 'xx' and 'zz' -> 'zz'; first non-null status is at
        # the smallest id carrying one (id 11)
        (10, 1, "a", None, "xx", 5),
        (11, 1, "a", "S1", "zz", None),
        (12, 1, "b", "S2", "q", 7),
        (13, 1, "b", None, None, 7),
        # cluster 2: single member, all policies degenerate
        (20, 2, "c", "S9", "mm", 1),
        # cluster 3: status all null -> 'first' yields NULL
        (30, 3, None, None, "n", 2),
    ]
    return spark.createDataFrame(
        rows,
        "doc_id long, cluster long, prio string, status string,"
        " note string, score int",
    )


def test_policies_and_tiebreaks(spark):
    out = {
        r.cluster: r
        for r in golden_records(
            _frame(spark),
            "cluster",
            {
                "prio": "mode",
                "status": "first",
                "note": "longest",
                "score": "max",
            },
            id_col="doc_id",
        ).collect()
    }
    c1 = out[1]
    assert c1.n_members == 4
    assert c1.prio == "b"        # tied count, string-wise largest wins
    assert c1.status == "S1"     # smallest id with a non-null status
    assert c1.note == "zz"       # tied length 2, lexicographically max
    assert c1.score == 7
    assert out[2].prio == "c" and out[2].status == "S9"
    assert out[3].status is None  # all-null field stays null
    assert out[3].n_members == 1


def test_mode_keeps_int_type_and_string_form_tiebreak(spark):
    """An int mode field returns as int; the documented tie-break is
    on the STRING form (so 9 beats 10 on a tie — pinned, not an
    accident)."""
    df = spark.createDataFrame(
        [(1, 1, 9), (2, 1, 9), (3, 1, 10), (4, 1, 10)],
        "doc_id long, cluster long, v int",
    )
    out = golden_records(df, "cluster", {"v": "mode"}).collect()[0]
    assert out.v == 9 and isinstance(out.v, int)


def test_min_policy_and_errors(spark):
    df = _frame(spark)
    out = golden_records(
        df, "cluster", {"score": "min"}
    ).collect()
    assert {r.cluster: r.score for r in out}[1] == 5
    with pytest.raises(ValueError, match="unknown survivorship"):
        golden_records(df, "cluster", {"score": "best"})
    with pytest.raises(ValueError, match="absent"):
        golden_records(df, "cluster", {"nope": "max"})
