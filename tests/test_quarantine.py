"""Quarantine split: clean + quarantined partition the table exactly,
quarantined == violating-doc set, single-pass write layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.quarantine import (
    quarantine_split,
    write_quarantine_split,
)
from anomalydetection_spark.plans.pipeline import run_validation


@pytest.fixture(scope="module")
def result(spark, docs, catalog):
    return run_validation(spark, docs, catalog=catalog)


def test_split_partitions_table_exactly(spark, docs, catalog, result):
    clean, quarantined = quarantine_split(docs, result.violations)
    n, nc, nq = docs.count(), clean.count(), quarantined.count()
    assert nc + nq == n
    # quarantined identity == distinct violating (doc_id, partition_id)
    exp = result.violations.select("doc_id", "partition_id").distinct()
    got = quarantined.select("doc_id", "partition_id").distinct()
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # clean docs carry no violation
    assert clean.join(
        exp, ["doc_id", "partition_id"], "left_semi"
    ).count() == 0
    # planted dup doc_ids: BOTH physical copies quarantined
    dup_id = result.violations.filter(
        F.col("check") == "uniqueness"
    ).select("doc_id").first().doc_id
    assert quarantined.filter(F.col("doc_id") == dup_id).count() == \
        docs.filter(F.col("doc_id") == dup_id).count()


def test_single_pass_write(spark, docs, catalog, result, tmp_path):
    out = str(tmp_path / "split")
    s = write_quarantine_split(docs, result.violations, out)
    clean = spark.read.parquet(s["clean"])
    quar = spark.read.parquet(s["quarantined"])
    assert s["n_clean"] == clean.count()
    assert s["n_quarantined"] == quar.count()
    assert s["n_clean"] + s["n_quarantined"] == docs.count()
    # span sequences survive the round trip verbatim (multiset equality)
    orig = docs.select("doc_id", "partition_id", "spans")
    merged = clean.select("doc_id", "partition_id", "spans").unionByName(
        quar.select("doc_id", "partition_id", "spans")
    )
    assert orig.exceptAll(merged).count() == 0
    assert merged.exceptAll(orig).count() == 0


def test_capped_violations_rejected(spark, docs, catalog):
    from dataclasses import replace

    from anomalydetection_spark.config import DEFAULT_CONFIG

    res = run_validation(
        spark, docs, catalog=catalog,
        cfg=replace(DEFAULT_CONFIG, max_violation_exemplars=2),
    )
    assert res.capped
    with pytest.raises(ValueError, match="uncapped"):
        quarantine_split(docs, res.violations, capped=res.capped)
