"""Uniqueness check: planted duplicate doc_ids found exactly once each,
verdicts at per-partition granularity (SURVEY.md §5 item 1; reference
semantics: every anomalous row emitted with its score,
/root/reference/database_manager.py:254-264)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.uniqueness import (
    duplicate_keys,
    uniqueness_verdicts,
    uniqueness_violations,
)


def test_duplicate_keys_exact(docs, expected):
    found = {r.doc_id for r in duplicate_keys(docs, "doc_id").collect()}
    assert found == expected["uniqueness"]


def test_duplicate_counts_are_two(docs):
    """Generator plants exactly pairwise dups (i and i-1 share an id)."""
    rows = duplicate_keys(docs, "doc_id").collect()
    assert rows and all(r.dup_cnt == 2 for r in rows)


def test_violations_carry_full_rows(docs, expected):
    v = uniqueness_violations(docs, "doc_id")
    # every duplicated key contributes BOTH of its rows, spans intact
    assert v.count() == 2 * len(expected["uniqueness"])
    assert set(v.columns) >= {"doc_id", "spans", "partition_id", "dup_cnt"}
    # span sequences on violation rows match the source rows verbatim
    orig = docs.join(
        F.broadcast(duplicate_keys(docs, "doc_id").select("doc_id")),
        "doc_id",
    ).select("doc_id", "spans")
    assert v.select("doc_id", "spans").exceptAll(orig).count() == 0


def test_salting_invariant(docs):
    """Salted two-phase agg gives identical results at any bucket count."""
    a = {(r.doc_id, r.dup_cnt) for r in duplicate_keys(docs, salt_buckets=2).collect()}
    b = {(r.doc_id, r.dup_cnt) for r in duplicate_keys(docs, salt_buckets=64).collect()}
    assert a == b


def test_per_partition_verdicts(docs, expected):
    v = uniqueness_verdicts(docs).collect()
    assert {r.check for r in v} == {"uniqueness"}
    failed = {r.partition_id for r in v if r.verdict == "fail"}
    # partitions actually containing a duplicated key's rows
    dup_parts = {
        r.partition_id
        for r in docs.join(
            duplicate_keys(docs).select("doc_id"), "doc_id"
        ).select("partition_id").distinct().collect()
    }
    assert failed == dup_parts
    total_viol = sum(r.n_violations for r in v)
    assert total_viol == 2 * len(expected["uniqueness"])


def test_clean_table_passes(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 0), ("c", 1)], "doc_id string, partition_id int"
    )
    assert duplicate_keys(df).count() == 0
    assert all(r.verdict == "pass" for r in uniqueness_verdicts(df).collect())


def test_composite_key_duplicates(spark):
    """Composite keys: duplicates on (a, b) pairs, not on either column
    alone; violations join back on the full key list."""
    from anomalydetection_spark.operators.uniqueness import (
        duplicate_keys,
        uniqueness_violations,
    )

    df = spark.createDataFrame(
        [(1, "x", 10), (1, "y", 11), (2, "x", 12), (1, "x", 13), (3, "z", 14)],
        "a bigint, b string, v bigint",
    )
    dups = duplicate_keys(df, ["a", "b"]).collect()
    assert [(r.a, r.b, r.dup_cnt) for r in dups] == [(1, "x", 2)]
    v = uniqueness_violations(df, ["a", "b"]).collect()
    assert sorted(r.v for r in v) == [10, 13]
