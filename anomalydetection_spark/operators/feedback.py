"""Anomaly feedback: mark violation rows as false positives and have
verdicts/metrics respect the override.

The working version of the reference's feedback path
(/root/reference/database_manager.py:266-290 flips
``anomaly_log_texts.is_anomaly`` per row and counts feedback per
model; the reference implementation is broken — undefined variable,
stale ``self.conn`` — but the *capability* is part of its surface).
Here: feedback is a tiny human-curated table of (check, doc_id) pairs;
violations gain an ``is_anomaly`` column (false iff marked); verdict
recomputation filters to live anomalies only, so a partition whose
every violation was marked flips to pass and the manifest metrics
follow.

Scale: feedback is human-generated — orders of magnitude smaller than
violations — so the mark join broadcasts it; the recompute touches
only the violations table (never the source table), which is the
whole point of deriving verdicts from violations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEEDBACK_SCHEMA = "check string, doc_id string"


def apply_feedback(violations: DataFrame, feedback: DataFrame) -> DataFrame:
    """Violations + ``is_anomaly`` boolean (false iff (check, doc_id)
    appears in feedback). Keeps every row — the audit trail survives,
    only the verdict math changes."""
    fb = (
        feedback.select("check", "doc_id")
        .distinct()
        .withColumn("_fb", F.lit(1))
    )
    return (
        violations.join(F.broadcast(fb), ["check", "doc_id"], "left")
        .withColumn("is_anomaly", F.col("_fb").isNull())
        .drop("_fb")
    )


def live_violations(flagged: DataFrame) -> DataFrame:
    """The rows verdict recomputation should see."""
    return flagged.filter(F.col("is_anomaly")).drop("is_anomaly")
