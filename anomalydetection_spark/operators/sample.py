"""Deterministic stratified sampling — training-data mixture control.

A pretraining pipeline mixes sources at prescribed ratios ("k docs per
stratum", or fractions per source). Spark's ``sampleBy`` is
probabilistic (binomial per row: approximate counts, seed-and-
partitioning dependent); pipelines that must be reproducible across
runs and engines need EXACT per-stratum counts with a deterministic,
data-independent ordering. This samples the top-k rows per stratum in
md5(id) order — a stable pseudo-random permutation any engine can
replay (the DuckDB oracle sorts by the same md5), so re-runs,
backfills, and audits select byte-identical rows.

Scale shape: one hash exchange on the stratum column; Spark's rank-
limit pushdown (WindowGroupLimit) truncates each partition to its
local top-k BEFORE the shuffle, so the exchange carries at most
k × partitions rows per stratum, not the stratum's full population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, picked by md5(id)
    order (deterministic, engine-replayable). Adds ``sample_rank``
    (1-based within the stratum)."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 256,
    stride: int | None = None,
) -> DataFrame:
    """Sliding-window chunking — the context-window prep step of a
    training pipeline: each document becomes ceil(n_tokens/stride)
    chunks of ≤ ``chunk_tokens`` whitespace tokens starting every
    ``stride`` tokens (default non-overlapping: stride =
    chunk_tokens). Output: (id, chunk_idx, chunk_text, n_tokens).

    Entirely row-local array math (split → windowed slices →
    posexplode) — chunking 10^12 docs is a narrow pass that fuses into
    the surrounding scan; no shuffle, no Python. Deterministic:
    chunk boundaries depend only on the token sequence. NULL-text
    documents produce NO chunks (a NULL token array once leaked one
    phantom chunk whose n_tokens claimed the full window because
    ``least`` skips NULL operands — charging chunk_tokens of packing
    budget per NULL doc downstream).
    """
    stride = chunk_tokens if stride is None else stride
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), " ")
    n_all = F.coalesce(F.size(toks), F.lit(0))
    starts = F.sequence(
        F.lit(0), F.greatest(n_all - 1, F.lit(0)), F.lit(stride)
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            F.concat_ws(
                " ", F.slice(toks, s + 1, chunk_tokens)
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), n_all - s).alias(
                "n_tokens"
            ),
        ),
    )
    return (
        df.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "_c"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.col("_c.chunk_text").alias("chunk_text"),
            F.col("_c.n_tokens").alias("n_tokens"),
        )
        # only the NULL/zero-token case yields n_tokens <= 0 (every
        # real start satisfies s <= n-1 so the tail chunk has >= 1)
        .filter(F.col("n_tokens") > 0)
    )


def stratified_sample_frac(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fractions: dict,
    default: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum fractional sampling — the mixture-
    weights form of stratified_sample (and the reproducible analog of
    ``DataFrame.sampleBy``): a row survives iff its md5-derived
    uniform in [0, 1) falls below its stratum's fraction. Selection
    depends only on (id, fraction) — identical across runs, partition
    layouts, and engines (the md5 arithmetic replays in SQL) — and is
    MONOTONE in the fraction: raising a stratum's weight only ADDS
    rows, never reshuffles the ones already selected (the property
    that makes dataset-mixture experiments comparable run over run).

    Zero shuffle: the filter is row-local; strata not in ``fractions``
    fall back to ``default`` (0.0 = drop)."""
    u = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15),
               16, 10).cast("double")
        / F.lit(float(16 ** 15))
    )
    frac = None
    for s, f in fractions.items():
        cond = F.col(strata_col) == s
        frac = (
            F.when(cond, float(f))
            if frac is None
            else frac.when(cond, float(f))
        )
    frac = (
        frac.otherwise(float(default))
        if frac is not None
        else F.lit(float(default))
    )
    return df.filter(u < frac)


def pack_chunks(
    chunks: DataFrame,
    group_col: str,
    order_cols: list[str],
    token_col: str = "n_tokens",
    budget: int = 2048,
) -> DataFrame:
    """Greedy in-order sequence packing: within each ``group_col``
    partition, walk the chunks in ``order_cols`` order and assign
    ``pack_id`` s.t. each pack's token total stays ≤ ``budget`` (a
    chunk alone bigger than the budget gets its own pack). This is the
    batch-assembly step after chunk_documents — training examples are
    packs, not raw chunks.

    Like the Drain template miner, the scan is ORDER-DEPENDENT and
    stateful (pack boundaries depend on the running total), so there
    is no shuffle-free relational form — it runs as Arrow-batched
    applyInPandas per group: one hash exchange on the group key and a
    per-group sort. The walk itself is numpy, O(packs) not O(rows):
    each pack is the maximal prefix of remaining chunks whose token
    sum fits the budget (always ≥ 1 chunk), found by binary-searching
    the cumulative-sum array — no per-row Python. Groups should be
    chosen so each fits a task (source, date-bucket, shard id);
    determinism follows from the explicit ordering.
    """
    import numpy as np
    import pandas as pd  # noqa: F401 (Arrow path dependency)
    from pyspark.sql import types as T

    out_schema = T.StructType(
        list(chunks.schema.fields)
        + [T.StructField("pack_id", T.LongType(), False)]
    )

    def _pack(pdf):
        pdf = pdf.sort_values(order_cols, kind="mergesort").reset_index(
            drop=True
        )
        cs = np.cumsum(pdf[token_col].to_numpy(dtype=np.int64))
        n = len(cs)
        bounds = []  # exclusive end index of each pack
        start, base = 0, 0
        while start < n:
            # maximal end with sum(toks[start:end]) <= budget; an
            # oversized single chunk still gets its own pack
            end = int(np.searchsorted(cs, base + budget, side="right"))
            if end <= start:
                end = start + 1
            bounds.append(end)
            base = int(cs[end - 1])
            start = end
        sizes = np.diff(np.concatenate(([0], bounds)))
        pdf["pack_id"] = np.repeat(
            np.arange(len(bounds), dtype=np.int64), sizes
        )
        return pdf

    return chunks.groupBy(group_col).applyInPandas(_pack, out_schema)


def plan_mixture(
    df,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixture planning — the sizing step before
    mixture_sample: given target mixture ``weights`` (source →
    fraction of the training budget) and a total ``token_budget``,
    compute per source how many tokens exist, how many the mixture
    wants, and the deterministic sampling rate that delivers them.

    Output per source:
    (source, n_docs, tokens_available, weight, target_tokens,
     sample_rate, expected_tokens, verdict)

    ``sample_rate = min(1, target/available)``; ``verdict`` is
    'short' when the source cannot fill its slice (rate capped at 1 —
    the epoch-repeat signal a data-mixing pipeline needs), else 'ok'.
    Sources absent from ``weights`` get weight 0 (rate 0).

    Scale shape: ONE partial-aggregating groupBy on the source column
    (the token count folds map-side); the plan arithmetic runs on the
    |sources|-row result. Nothing else touches row data, so this
    composes with the same scan as the quality/dedup funnel.
    """
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in kv]
    )
    toks = F.size(F.split(F.lower(F.trim(F.col(text_col))), " "))
    # a source whose every text is NULL sums to NULL tokens — coalesce
    # to 0 so the rate/verdict arithmetic below sees an empty source
    # instead of NULL-swallowing its way to rate 1.0 / verdict 'ok'
    # (least() skips NULL operands and `target > NULL` is NULL)
    agg = df.groupBy(source_col).agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum(toks.cast("long")), F.lit(0)).alias(
            "tokens_available"
        ),
    )
    weight = F.coalesce(
        wmap[F.col(source_col)].cast("double"), F.lit(0.0)
    )
    target = F.round(weight * F.lit(float(token_budget))).cast("long")
    rate = F.when(F.col("tokens_available") == 0, F.lit(0.0)).otherwise(
        F.round(
            F.least(
                F.lit(1.0),
                F.col("target_tokens") / F.col("tokens_available"),
            ),
            6,
        )
    )
    return (
        agg.withColumn("weight", F.round(weight, 6))
        .withColumn("target_tokens", target)
        .withColumn("sample_rate", rate)
        .withColumn(
            "expected_tokens",
            F.round(F.col("sample_rate") * F.col("tokens_available"))
            .cast("long"),
        )
        .withColumn(
            "verdict",
            F.when(
                F.col("target_tokens") > F.col("tokens_available"),
                F.lit("short"),
            ).otherwise(F.lit("ok")),
        )
    )


def assign_folds(
    df: DataFrame,
    id_col: str = "doc_id",
    k: int = 5,
    group_col: str | None = None,
    salt: str = "folds",
) -> DataFrame:
    """Deterministic k-fold split assignment, optionally GROUP-AWARE:
    when ``group_col`` is given (e.g. the dedup cluster id), every row
    of a group lands in the SAME fold — near-duplicate copies can
    never straddle a train/eval boundary, which is the split-level
    fix for the leakage the cross-split near-dup matrix
    (q_cross_source_dup_matrix) measures after the fact.

    Fold = first 8 md5 nibbles of (salt ':' fold-key) mod k — the
    repo's engine-replayable hash scheme: no RNG, no state, stable
    under re-runs/backfills, and any engine (or the DuckDB oracle)
    recomputes the same assignment from the same keys. Row-local
    projection, zero shuffle; expected fold skew is the binomial
    deviation around n/k (auditable with q_partition_skew)."""
    fold = (
        F.expr(
            f"cast(conv(substring(md5(concat('{salt}', ':', "
            f"cast({group_col if group_col else id_col} as string)"
            f")), 1, 8), 16, 10) as bigint) % {k}"
        )
    ).alias("fold")
    return df.withColumn("fold", fold)
