"""CLI runner (anomalydetection_spark/run.py): one batch round end to
end — verdicts/violations written, manifest committed, second round
validates nothing (resume)."""

from __future__ import annotations

import json

from anomalydetection_spark.run import one_round, parse_args


def test_one_round_and_resume(spark, docs_path, catalog, tmp_path):
    cat_path = str(tmp_path / "catalog")
    catalog.write.mode("overwrite").parquet(cat_path)
    out = str(tmp_path / "out")
    mdir = str(tmp_path / "manifest")

    args = parse_args(
        [
            "--docs", docs_path,
            "--catalog", cat_path,
            "--manifest-dir", mdir,
            "--out", out,
        ]
    )
    s1 = one_round(spark, args, "r1")
    assert s1["manifest_version"] >= 1
    assert s1["validated_partitions"]
    assert s1["n_failed_checks"] > 0  # planted violations
    v = spark.read.parquet(s1["verdicts"])
    assert v.count() > 0
    viol = spark.read.parquet(s1["violations"])
    assert viol.count() > 0
    json.dumps(s1)  # summary is JSON-serializable

    s2 = one_round(spark, args, "r2")
    assert s2["validated_partitions"] == []
