"""North-rule packaging check: the engine runs via
``spark-submit --py-files engine.zip run_entry.py`` exactly as the CLI
docstring advertises — the zip is built from the package dir, the
driver imports only from the zip (cwd is a scratch dir), and a full
validation round writes verdicts + violations + manifest."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import zipfile

import pytest

SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_round(spark, docs_path, catalog, tmp_path):
    cat_path = str(tmp_path / "catalog")
    catalog.write.mode("overwrite").parquet(cat_path)

    # package exactly like the docstring: zip -r engine.zip anomalydetection_spark
    zpath = str(tmp_path / "engine.zip")
    pkg = os.path.join(REPO, "anomalydetection_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    entry = str(tmp_path / "run_entry.py")
    with open(entry, "w") as f:
        f.write("from anomalydetection_spark.run import main; main()\n")

    out = str(tmp_path / "out")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]",
            "--py-files", zpath,
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            entry,
            "--docs", docs_path, "--catalog", cat_path,
            "--manifest-dir", str(tmp_path / "manifest"),
            "--out", out, "--run-id", "submit1",
        ],
        cwd=str(tmp_path),            # NOT the repo: zip must satisfy imports
        env=env,
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["run_id"] == "submit1"
    assert summary["validated_partitions"]
    assert summary["n_failed_checks"] > 0      # planted violations
    v = spark.read.parquet(summary["verdicts"])
    assert v.count() > 0
    assert os.path.exists(os.path.join(str(tmp_path / "manifest"), "CURRENT"))
