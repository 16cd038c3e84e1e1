"""spark-submit --py-files packaging contract: the zip artifact alone
must carry the whole engine import surface (the north rule's
deployment shape — executors get only the zip on sys.path)."""

from __future__ import annotations

import os
import subprocess
import sys
import zipfile


def test_pyfiles_zip_imports_standalone(tmp_path):
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    from package_pyfiles import build

    zip_path = build(str(tmp_path))
    assert os.path.exists(zip_path)
    with zipfile.ZipFile(zip_path) as zf:
        names = zf.namelist()
    assert "anomalydetection_spark/run.py" in names
    assert "anomalydetection_spark/queries.py" in names
    assert not any("__pycache__" in n for n in names)
    assert not any(n.startswith("tests/") for n in names)

    # fresh interpreter, ONLY the zip on the path (plus site deps):
    # import the package root, the CLI parser, and a spread of operator
    # modules — what every executor does when Spark ships the zip
    probe = (
        "import sys; sys.path.insert(0, %r); "
        "import anomalydetection_spark; "
        "from anomalydetection_spark.run import parse_args; "
        "import anomalydetection_spark.queries, "
        "anomalydetection_spark.operators.dedup, "
        "anomalydetection_spark.operators.drift, "
        "anomalydetection_spark.streaming.incremental, "
        "anomalydetection_spark.sources.manifest; "
        "a = parse_args(['--docs', 'x', '--out', 'y']); "
        "assert a.docs == 'x'; "
        "assert anomalydetection_spark.queries.__file__.startswith(%r); "
        "print('ZIP-IMPORT-OK')"
    ) % (zip_path, zip_path)
    out = subprocess.run(
        [sys.executable, "-c", probe],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),  # NOT the repo dir — no fallback to sources
        timeout=120,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ZIP-IMPORT-OK" in out.stdout
