"""PII detection and redaction over text columns.

Training-data-pipeline extension (no reference analog — the closest is
the reference's log-line masking, /root/reference/log_parser.py:113-119,
which rewrites matched substrings to fixed tags; this applies the same
rewrite mechanics to PII classes instead of log fields).

Patterns are deliberately conservative regexes that mean the same thing
in Java's regex engine (Spark, JVM-side `regexp_extract_all` /
`regexp_replace` — no Python in the path) and RE2 (DuckDB oracle):
character classes, bounded repetition, no backrefs or lookaround. The
detector counts matches per class; the redactor rewrites them to
`[CLASS]` tags in a fixed order (email → ipv4 → phone) so the
character-delta accounting is deterministic.

Scale shape: both detection and redaction are row-local expressions
inside whole-stage codegen — they fuse into whatever scan or filter
surrounds them and add zero shuffles at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Ordered: redaction applies in this order (email first so its digits
# never get half-eaten by the looser numeric patterns).
PII_PATTERNS: dict[str, str] = {
    "email": r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}",
    "ipv4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "phone": r"\d{3}-\d{4}",
}


def pii_counts(text: Column | str) -> list[Column]:
    """One match-count column per PII class: <class>_hits."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(pat), 0)).alias(
            f"{name}_hits"
        )
        for name, pat in PII_PATTERNS.items()
    ]


def redact_pii(text: Column | str) -> Column:
    """Rewrite every PII match to its [CLASS] tag, in pattern order."""
    out = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"[{name.upper()}]")
    return out


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-row PII audit: match counts per class, a has_pii flag, and
    the redaction character delta (original length − redacted length;
    negative when tags are longer than matches)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        *pii_counts(t),
        (F.length(t) - F.length(redact_pii(t))).alias("chars_delta"),
    ).withColumn(
        "has_pii",
        sum(
            (F.col(f"{n}_hits") > 0).cast("int") for n in PII_PATTERNS
        )
        > 0,
    )


def text_of_spans(spans_col: str = "spans") -> Column:
    """Concatenated text payload of a doc's text spans, span order
    preserved (array order IS document order per the span-sequence
    invariant — no re-sort needed)."""
    return F.array_join(
        F.transform(
            F.filter(spans_col, lambda s: s["kind"] == "text"),
            lambda s: F.coalesce(s["text"], F.lit("")),
        ),
        " ",
    )


def hygiene_report(docs: DataFrame) -> DataFrame:
    """Per-partition PII audit of the interleaved documents table:
    match counts per class over the concatenated text spans, affected
    doc counts/rates, and the redaction character delta. Row-local
    expressions + one metadata-scale rollup — the audit adds one
    narrow pass however large the table."""
    t = text_of_spans()
    hit_cols = [f"{n}_hits" for n in PII_PATTERNS]
    per_doc = docs.select(
        "partition_id",
        *pii_counts(t),
        (F.length(t) - F.length(redact_pii(t))).alias("chars_delta"),
    )
    any_hit = None
    for c in hit_cols:
        cond = F.col(c) > 0
        any_hit = cond if any_hit is None else (any_hit | cond)
    return (
        per_doc.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            *[F.sum(c).cast("long").alias(c) for c in hit_cols],
            F.sum(any_hit.cast("int")).cast("long").alias("n_pii_docs"),
            F.sum("chars_delta").cast("long").alias("chars_delta"),
        )
        .withColumn(
            "pii_doc_rate", F.col("n_pii_docs") / F.col("n_docs")
        )
    )
