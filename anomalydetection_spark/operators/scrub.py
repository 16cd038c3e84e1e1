"""Duplicated n-gram span scrubbing — substring-level dedup.

Document-level dedup (exact / MinHash / SimHash, operators/dedup.py)
drops whole documents; web corpora additionally carry SPANS repeated
across many otherwise-distinct documents (boilerplate, license
blocks, navigation text). The RefinedWeb / "Deduplicating Training
Data Makes Language Models Better" (Lee et al., 2022) recipe removes
any n-gram window that occurs in too many documents, keeping the
rest of each document intact. This is that operator, Spark-first:

1. tokenize each doc once (row-local split),
2. explode the n-gram start positions (one row per shingle),
3. ONE groupBy on the shingle for a distinct-doc frequency count —
   the classic heavy shuffle of corpus-level substring dedup; at
   10^12 docs the shuffle key should be a 64-bit shingle hash
   (``hash_shingles=True``, default) so the exchange moves 8 bytes
   per shingle instead of the n-word string,
4. semi-join shingle occurrences to the frequent set and fold the
   surviving start positions back to one bounded array per doc
   (≤ doc length, so collect_list state is bounded),
5. row-local interval-coverage mask rebuilds the scrubbed text —
   a token at position p is removed iff some frequent shingle starts
   in [p-n+1, p]. No second shuffle wider than (doc_id, starts).

Reference behavior anchor: the reference engine dedups whole scored
anomalies only (/root/reference/log_parser.py:61-76 exact-match
cache); span-level scrubbing is the corpus-scale generalization a
training pipeline needs on top.

Scale shape: cost is dominated by the shingle-frequency exchange —
rows = total tokens, bytes = 8/row with hashing. Skewed shingles
(a single token repeated corpus-wide) are absorbed by the partial
aggregate (map-side combine on the hash key). The coverage fold is
O(tokens × frequent-starts-per-doc) row-local work with no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scrub_duplicated_ngrams(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
    hash_shingles: bool = True,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Remove every ``n``-token window that occurs in ≥ ``min_docs``
    distinct documents; return one row per document:

    (id, [keep_cols...,] n_tokens, n_removed, removed_ratio,
     scrubbed_text)

    ``scrubbed_text`` is the space-join of surviving tokens in their
    original order. Deterministic: depends only on the token
    sequences, never on partitioning. ``hash_shingles`` groups on
    xxhash64(shingle) (the 10^12-doc shuffle shape — 8-byte keys);
    ``False`` groups on the string itself (engine-portable for the
    DuckDB oracle; test_scrub pins that both paths produce identical
    output on the fixture corpus). ``keep_cols`` are carried through
    the doc-side frame so a pipeline can rebuild its corpus without a
    SECOND corpus-wide join back on the id (the doc frame already
    travels through the starts attach — passthrough is free).
    """
    did = F.col(id_col)
    keep_cols = list(keep_cols or [])
    toks = df.select(
        did.alias("__id"),
        F.split(F.lower(F.trim(F.col(text_col))), " ").alias("__arr"),
        *[F.col(c) for c in keep_cols],
    )

    # One row per n-gram start position (1-based, matching Spark's
    # 1-based slice()); docs shorter than n emit nothing.
    n_lit = F.lit(n)
    starts = toks.select(
        "__id",
        F.posexplode(
            F.when(
                F.size("__arr") >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size("__arr") - n + 1),
                    lambda i: F.array_join(F.slice("__arr", i, n_lit), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("__pos0", "__shingle"),
    ).select(
        "__id",
        (F.col("__pos0") + 1).alias("__start"),
        (
            F.xxhash64("__shingle") if hash_shingles else F.col("__shingle")
        ).alias("__key"),
    )

    freq = (
        starts.groupBy("__key")
        .agg(F.count_distinct("__id").alias("__nd"))
        .where(F.col("__nd") >= min_docs)
        .select("__key")
    )

    doc_starts = (
        starts.join(freq, "__key", "left_semi")
        .groupBy("__id")
        .agg(F.array_sort(F.collect_list("__start")).alias("__starts"))
    )

    joined = toks.join(doc_starts, "__id", "left").select(
        "__id",
        "__arr",
        F.coalesce("__starts", F.array().cast("array<int>")).alias("__starts"),
        *keep_cols,
    )

    starts_col = F.col("__starts")
    kept = F.filter(
        F.zip_with(
            F.col("__arr"),
            F.sequence(F.lit(1), F.size("__arr")),
            lambda t, p: F.struct(t.alias("t"), p.alias("p")),
        ),
        lambda z: ~F.exists(
            starts_col,
            lambda s: (s <= z["p"]) & (z["p"] <= s + n - 1),
        ),
    )
    n_tokens = F.size("__arr")
    n_kept = F.size(kept)
    return joined.select(
        F.col("__id").alias(id_col),
        *keep_cols,
        n_tokens.alias("n_tokens"),
        (n_tokens - n_kept).alias("n_removed"),
        F.round((n_tokens - n_kept) / n_tokens, 6).alias("removed_ratio"),
        F.array_join(
            F.transform(kept, lambda z: z["t"]), " "
        ).alias("scrubbed_text"),
    )
