"""Benchmark decontamination: flag corpus documents that share any
word n-gram with a benchmark/eval set.

The reference has no analog — this is a training-data-pipeline
extension (the standard "remove eval contamination before pretraining"
step: GPT-3 used 13-gram overlap, the n here is a parameter). The
mechanics reuse the dedup family's shapes: tokenize → n-gram shingles →
set intersection, except one side (the benchmark) is tiny relative to
the corpus, so the join is a broadcast semi-join against the DISTINCT
benchmark gram set rather than an LSH chain.

Scale shape at 10^12 corpus docs:
- The benchmark gram set is bounded by the benchmark's size (eval sets
  are ~10^4-10^6 docs → ~10^6-10^8 grams); below ``broadcast_max_grams``
  it ships once to every executor and the probe is a narrow pass over
  the corpus (no corpus shuffle at all until the per-doc aggregation,
  which is map-side combinable on doc_id — grams of one doc live in one
  row before explode, so the partial agg collapses them locally).
- Above the cap, the same call degrades to a plain shuffled semi-join
  and AQE picks the strategy; for gram sets that don't fit even that,
  build a Bloom filter over grams with functions/bloom.py and accept
  the fpp as an over-flagging rate (decontamination tolerates false
  positives — dropping a clean doc is cheap, keeping a contaminated
  one is not).

Tokenization is the catalog's shared convention (split lowercased
trimmed text on single spaces) so the DuckDB oracle replays it
bit-exactly (queries.py::decontamination).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BROADCAST_MAX_GRAMS = 20_000_000


def word_ngrams(text_col, n: int) -> Column:
    """Distinct word n-grams (space-joined) of the lowercased trimmed
    text; empty array when the document has fewer than n tokens."""
    toks = F.split(F.lower(F.trim(text_col)), " ")
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def benchmark_grams(
    benchmark: DataFrame, text_col="text", n: int = 4
) -> DataFrame:
    """DISTINCT n-gram set of the benchmark side — the broadcast side.
    ``text_col`` may be a column name or an expression (e.g. the
    concatenated text spans of the interleaved documents table)."""
    tc = F.col(text_col) if isinstance(text_col, str) else text_col
    return benchmark.select(
        F.explode(word_ngrams(tc, n)).alias("gram")
    ).distinct()


def contaminated_docs(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    broadcast_grams: bool | None = None,
) -> DataFrame:
    """(id, n_matched_grams) for every corpus doc sharing ≥1 n-gram
    with the benchmark. ``broadcast_grams=None`` lets AQE decide;
    True requests the broadcast hint (callers that know the benchmark
    is eval-set-sized should pass True) — but the hint is still capped:
    if the DISTINCT gram set exceeds ``BROADCAST_MAX_GRAMS`` the call
    degrades to a plain shuffled join instead of OOM-ing the driver
    building an unbounded broadcast table. The gram count is taken on
    the gram set itself (one narrow count over the benchmark — cheap by
    definition of a benchmark side; it is the corpus side that is
    big)."""
    bench = benchmark_grams(benchmark, text_col, n)
    if broadcast_grams:
        # the cap probe consumes the gram set once and the join
        # consumes it again — cache so the tokenize→explode→distinct
        # job over the benchmark runs once, not twice
        bench = bench.cache()
        if bench.count() <= BROADCAST_MAX_GRAMS:
            bench = F.broadcast(bench)
        # else: over the cap — the join runs un-hinted (shuffled)
        # rather than OOM-ing the driver with an unbounded broadcast
    tc = F.col(text_col) if isinstance(text_col, str) else text_col
    grams = corpus.select(
        F.col(id_col),
        F.explode(word_ngrams(tc, n)).alias("gram"),
    )
    return grams.join(bench, "gram").groupBy(id_col).agg(
        F.count("*").alias("n_matched_grams")
    )


def source_overlap(
    docs: DataFrame,
    group_col: str = "source",
    text_col="text",
    n: int = 4,
) -> DataFrame:
    """Cross-split leakage matrix: for every ordered pair of sources,
    how many distinct word n-grams they share and what fraction of the
    left source's gram set that is — the sweep a corpus owner runs
    before trusting train/eval splits drawn from different sources
    (the pairwise generalization of ``contaminated_docs``' one-vs-
    benchmark check).

    Scale shape: ONE distinct (source, gram) reduction, then a
    groupBy(gram) → collect_set(source) whose arrays are bounded by
    the number of sources (handfuls, never rows), exploded to ordered
    pairs and counted — no gram-keyed self-join, so the shuffle is the
    distinct + one bounded-array aggregation however large the corpus.
    Output: (source_a, source_b, n_shared, n_grams_a, overlap_frac);
    pairs sharing zero grams are absent.
    """
    tc = F.col(text_col) if isinstance(text_col, str) else text_col
    g = docs.select(
        F.col(group_col).alias("src"),
        F.explode(word_ngrams(tc, n)).alias("gram"),
    ).distinct()
    per = g.groupBy("src").agg(F.count("*").alias("n_grams_a"))
    pairs = (
        g.groupBy("gram")
        .agg(F.collect_set("src").alias("ss"))
        .select(F.explode("ss").alias("source_a"), "ss")
        .select("source_a", F.explode("ss").alias("source_b"))
        .filter(F.col("source_a") != F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
    )
    return pairs.join(
        per.withColumnRenamed("src", "source_a"), "source_a"
    ).select(
        "source_a",
        "source_b",
        "n_shared",
        F.col("n_grams_a").cast("long").alias("n_grams_a"),
        F.round(F.col("n_shared") / F.col("n_grams_a"), 6).alias(
            "overlap_frac"
        ),
    )


def contaminated_docs_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 4,
    fpp: float = 0.01,
) -> DataFrame:
    """The documented degradation path, working: when the benchmark
    gram set is too large to broadcast OR the corpus side is too
    expensive to shuffle on gram, probe a Bloom filter built over the
    benchmark grams (functions/bloom.py — treeAggregate-merged,
    broadcast once per executor) instead of joining at all.

    The fpp becomes an over-flagging rate, which decontamination
    tolerates by construction: dropping a clean doc costs one doc,
    keeping a contaminated one poisons an eval. Output matches
    ``contaminated_docs`` (id, n_matched_grams) but n_matched_grams
    counts BLOOM hits (>= the true count; exact path is the
    verification tier — containment pinned in tests).

    Scale shape: the corpus side never shuffles — grams explode,
    probe row-locally inside the scan, and the per-doc count is a
    map-side-combinable groupBy on the doc id."""
    from ..functions.bloom import build_bloom, might_contain_udf

    # sizing count + bloom build both consume the gram set — cache so
    # the benchmark-side distinct job runs once; unpersist immediately
    # (the bloom bits, not the frame, are what the probe carries)
    bench = benchmark_grams(benchmark, text_col, n).cache()
    n_grams = bench.count()
    bits, k, m = build_bloom(bench, "gram", n_grams, fpp)
    bench.unpersist()
    probe = might_contain_udf(corpus.sparkSession, bits, k, m)
    tc = F.col(text_col) if isinstance(text_col, str) else text_col
    grams = corpus.select(
        F.col(id_col),
        F.explode(word_ngrams(tc, n)).alias("gram"),
    )
    return (
        grams.filter(probe(F.col("gram")))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_matched_grams"))
    )


def novelty_scores(
    corpus: DataFrame,
    baseline: DataFrame,
    id_col: str = "doc_id",
    text_col="text",
    n: int = 3,
    broadcast_grams: bool = True,
) -> DataFrame:
    """Per-document n-gram novelty against a baseline corpus: the
    fraction of a doc's DISTINCT word n-grams absent from the
    baseline's gram set — the inverse of contamination, used to rank
    candidate training data by how much NEW text it contributes
    (near-1 = fresh content, near-0 = re-crawl/boilerplate the
    baseline already covers).

    Same scale shape as ``contaminated_docs``: the baseline collapses
    to its DISTINCT gram relation once (broadcast below
    BROADCAST_MAX_GRAMS, shuffled join above, Bloom tier beyond
    that); the corpus explodes grams and aggregates per doc with a
    map-side-combinable count. Docs with fewer than ``n`` tokens have
    no grams: n_grams = 0 and novelty NULL (no evidence ≠ novel).

    Output: (id, n_grams, n_novel, novelty)."""
    base = benchmark_grams(baseline, text_col, n).withColumn(
        "_seen", F.lit(1)
    )
    if broadcast_grams:
        base = F.broadcast(base)
    tc = F.col(text_col) if isinstance(text_col, str) else text_col
    grams = corpus.select(
        F.col(id_col), F.explode(word_ngrams(tc, n)).alias("gram")
    )
    per_doc = (
        grams.join(base, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.when(F.col("_seen").isNull(), 1).otherwise(0)).alias(
                "n_novel"
            ),
        )
    )
    return (
        corpus.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.col("n_novel") / F.col("n_grams"),
            ).alias("novelty"),
        )
    )
