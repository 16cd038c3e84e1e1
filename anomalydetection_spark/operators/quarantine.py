"""Quarantine split: route violating docs away from the clean table.

The reference marks anomalies in place (anomaly_log_texts rows,
/root/reference/database_manager.py:51-58) and leaves consumers to
filter; at 10^12 docs the engine instead materializes the split once —
downstream training jobs read the clean table with zero further
filtering, and the quarantine table carries the full original rows for
review/repair.

Scale shape: ONE wide scan. The violating-doc identity set (doc_id,
partition_id — violation-rate x table cardinality, tiny next to the
table) attaches via broadcast semi-style flag when it fits, shuffle
join beyond; the clean/quarantined routing is a partitioned write of
the SAME scan (`partitionBy` on the flag), not two passes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.pipeline import BROADCAST_MAX_ROWS


def _flagged(
    docs: DataFrame, violations: DataFrame, capped: bool = False
) -> DataFrame:
    """docs + boolean ``__quarantine`` flag (true = doc has >=1
    violation row). Violations must be UNCAPPED — exemplar-capped
    output names only K docs per group, the rest would leak into the
    clean table silently (pass ``capped=ValidationResult.capped``)."""
    if capped or any(c.startswith("__") for c in violations.columns):
        raise ValueError(
            "quarantine_split needs uncapped violations "
            "(exemplar-capped output names only K docs per group; "
            "re-run without max_violation_exemplars)"
        )
    keys = (
        violations.select("doc_id", "partition_id")
        .distinct()
        .withColumn("__quarantine", F.lit(True))
    )
    kb = (
        F.broadcast(keys)
        if keys.count() <= BROADCAST_MAX_ROWS
        else keys
    )
    return docs.join(kb, ["doc_id", "partition_id"], "left").withColumn(
        "__quarantine", F.coalesce("__quarantine", F.lit(False))
    )


def quarantine_split(
    docs: DataFrame, violations: DataFrame, capped: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantined) DataFrames. Two actions on the result will
    scan twice — prefer ``write_quarantine_split`` for materialization."""
    flagged = _flagged(docs, violations, capped)
    return (
        flagged.filter(~F.col("__quarantine")).drop("__quarantine"),
        flagged.filter(F.col("__quarantine")).drop("__quarantine"),
    )


def write_quarantine_split(
    docs: DataFrame, violations: DataFrame, out_dir: str,
    capped: bool = False,
) -> dict:
    """Single-pass materialization: one scan of ``docs``, routed to
    ``<out_dir>/__quarantine=false|true`` by the partitioned write.
    Returns {"clean": path, "quarantined": path, "n_quarantined": int,
    "n_clean": int}."""
    _flagged(docs, violations, capped).write.mode("overwrite").partitionBy(
        "__quarantine"
    ).parquet(out_dir)
    spark = docs.sparkSession
    out = spark.read.parquet(out_dir)
    # partition-dir values read back as strings ("true"/"false") unless
    # type inference promotes them — normalize before keying
    counts = {
        str(r["__quarantine"]).lower() == "true": r["n"]
        for r in out.groupBy("__quarantine")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return {
        "clean": os.path.join(out_dir, "__quarantine=false"),
        "quarantined": os.path.join(out_dir, "__quarantine=true"),
        "n_clean": int(counts.get(False, 0)),
        "n_quarantined": int(counts.get(True, 0)),
    }
