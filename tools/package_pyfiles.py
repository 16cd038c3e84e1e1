"""Build the --py-files artifact for cluster submission.

Produces ``dist/anomalydetection_spark.zip`` containing the package
(sources only — no __pycache__, no tests), which is the exact artifact
the north rule's deployment shape consumes:

    spark-submit --py-files dist/anomalydetection_spark.zip \\
        anomalydetection_spark/run.py \\
        --docs s3://bucket/docs --catalog s3://bucket/media_catalog \\
        --manifest-dir s3://bucket/manifest --out s3://bucket/out

Executors import ``anomalydetection_spark.*`` from the zip (Python
imports from zip archives natively; Spark ships it to every executor's
working directory and prepends it to sys.path). The driver-side entry
is ``run.py`` itself. tests/test_packaging.py builds this artifact and
proves a fresh interpreter can import the full operator surface from
the zip alone.
"""

from __future__ import annotations

import os
import sys
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = "anomalydetection_spark"


def build(out_dir: str | None = None) -> str:
    out_dir = out_dir or os.path.join(ROOT, "dist")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{PKG}.zip")
    src = os.path.join(ROOT, PKG)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(src):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in sorted(files):
                if not f.endswith(".py"):
                    continue
                full = os.path.join(root, f)
                rel = os.path.relpath(full, ROOT)
                zf.write(full, rel)
    return out


if __name__ == "__main__":
    path = build(sys.argv[1] if len(sys.argv) > 1 else None)
    print(path)
    print(
        "submit: spark-submit --py-files "
        f"{path} {os.path.join(ROOT, PKG, 'run.py')} "
        "--docs <path> --catalog <path> --manifest-dir <path> --out <path>"
    )
