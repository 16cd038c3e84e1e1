"""PII detection/redaction operator (operators/pii.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.pii import (
    pii_scan,
    redact_pii,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_counts_per_class(spark):
    df = _df(
        spark,
        [
            (1, "mail me at bob@corp.io or alice@x.org now"),
            (2, "server 10.0.3.77 then 192.168.1.1"),
            (3, "call 555-1234"),
            (4, "clean text with no identifiers at all"),
        ],
    )
    out = {r.doc_id: r for r in pii_scan(df).collect()}
    assert (out[1].email_hits, out[1].ipv4_hits, out[1].phone_hits) == (2, 0, 0)
    assert out[2].ipv4_hits == 2
    assert out[3].phone_hits == 1
    assert not out[4].has_pii and out[4].chars_delta == 0
    assert all(out[i].has_pii for i in (1, 2, 3))


def test_redaction_rewrites_to_tags(spark):
    df = _df(spark, [(1, "bob@corp.io at 10.0.3.77 call 555-1234")])
    red = df.select(redact_pii("text").alias("r")).first().r
    assert red == "[EMAIL] at [IPV4] call [PHONE]"


def test_redaction_order_email_before_numeric(spark):
    """An address with digits must be eaten by the email pattern as a
    whole, not partially rewritten by the numeric classes."""
    df = _df(spark, [(1, "x99.7@a.bc done")])
    red = df.select(redact_pii("text").alias("r")).first().r
    assert red == "[EMAIL] done"


def test_scan_is_shuffle_free(spark):
    df = _df(spark, [(1, "bob@corp.io")])
    plan = pii_scan(df)._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning" not in plan and "Exchange" not in plan
