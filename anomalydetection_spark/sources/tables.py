"""Table resolution: Iceberg catalog tables when available, parquet
paths otherwise — the concrete form of the "real catalog is a config
swap" promise in sources/manifest.py.

The north-rule target is Iceberg tables of interleaved documents. This
sandbox has no Iceberg runtime jar, so the engine reads parquet paths;
on a cluster with ``iceberg-spark-runtime`` on the classpath (and a
catalog configured via ``spark.sql.catalog.<name>``), the SAME engine
code reads catalog identifiers — `read_table` dispatches on the
identifier shape and `iceberg_available` probes the classpath, so no
call site changes.

Why this matters at 10^12 docs: Iceberg gives the manifest layer real
snapshot ids + partition-level file pruning; our file-based manifest
(sources/manifest.py) reproduces those semantics (snapshot hash, atomic
version commits) over plain parquet so the engine behaves identically
in both modes.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

ICEBERG_SOURCE = "iceberg"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg DataSource is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource"
        )
        return True
    except Exception:
        return False


_DATA_FILE_EXTS = (
    ".parquet", ".orc", ".avro", ".csv", ".tsv", ".json", ".jsonl",
    ".txt", ".log",
)

_IDENT_SEGMENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def is_table_identifier(ref: str) -> bool:
    """catalog.db.table identifiers vs filesystem/URI paths.

    A relative filename like ``data.parquet`` is slash-free and dotted
    but must NOT route to the catalog reader: require 2-3
    identifier-shaped dot-separated segments and reject known data-file
    extensions.
    """
    if (
        "/" in ref
        or "\\" in ref
        or ref.startswith(("s3:", "gs:", "abfs:", "hdfs:", "file:"))
        or ref.lower().endswith(_DATA_FILE_EXTS)
    ):
        return False
    parts = ref.split(".")
    return 2 <= len(parts) <= 3 and all(
        _IDENT_SEGMENT.match(p) for p in parts
    )


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    """Read ``ref`` as an Iceberg catalog table when it looks like a
    table identifier AND Iceberg is on the classpath; else parquet."""
    if is_table_identifier(ref) and iceberg_available(spark):
        return spark.read.format(ICEBERG_SOURCE).load(ref)
    return spark.read.parquet(ref)
