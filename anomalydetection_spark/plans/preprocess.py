"""End-to-end training-data preprocessing funnel: quality filter →
near-dup removal → benchmark decontamination, with per-stage attrition
accounting.

This is the pipeline a pretraining-data owner actually runs over a raw
corpus, composed from the catalog's first-class operators
(operators/quality.py, operators/dedup.py, operators/decontaminate.py)
in the canonical order: row-local rules first (cheapest per doc —
everything they drop never reaches the shuffle-bearing stages), then
LSH dedup among the survivors, then the benchmark n-gram probe. The
reference has no pipeline layer at all (its main loop wires one model
per log file, /root/reference/main.py:55-160); this is the
corpus-scale generalization.

Scale shape:
- quality: pure Column expressions inside the scan, zero shuffle;
- dedup: LSH banding (bucketed candidate join) + components on the
  PAIR graph, duplicate-id set attaches by broadcast below the size
  gate;
- decontamination: DISTINCT benchmark gram set, broadcast probe
  (or the Bloom path for oversized gram sets);
- the funnel counts are one action per stage boundary over a cached
  id+flag frame — never a second scan of the wide corpus.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class PreprocessResult:
    kept: DataFrame                     # surviving docs, full rows
    funnel: list = field(default_factory=list)
    # [{stage, n_in, n_dropped, n_out}, ...] in execution order
    packed: DataFrame | None = None     # chunk rows + pack_id (opt-in)
    packing: dict | None = None         # packing stats (opt-in)


def run_preprocess(
    spark,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col="text",
    quality: bool = True,
    dedup: bool = True,
    dedup_threshold: float = 0.8,
    dedup_max_bucket: int | None = None,
    benchmark: DataFrame | None = None,
    bench_text_col: str = "text",
    ngram: int = 4,
    scrub_ngrams: int | None = None,
    scrub_min_docs: int = 2,
    chunk_tokens: int | None = None,
    chunk_stride: int | None = None,
    pack_budget: int | None = None,
    pack_shards: int = 32,
) -> PreprocessResult:
    """Run the funnel; every stage is optional. Returns the kept
    DataFrame (lazy — caller writes it) plus the attrition funnel."""
    from ..operators.decontaminate import contaminated_docs
    from ..operators.dedup import duplicate_clusters, minhash_lsh_pairs
    from ..operators.quality import quality_flags

    text = F.col(text_col) if isinstance(text_col, str) else text_col
    funnel: list = []
    cur = docs
    n_in = cur.count()

    if quality:
        flags = quality_flags(text)
        bad = None
        for c in flags.values():
            bad = c if bad is None else (bad | c)
        # null text fails closed (a doc whose rules can't evaluate is
        # not a keep)
        prev = cur
        cur = cur.filter(~F.coalesce(bad, F.lit(True))).cache()
        n_q = cur.count()
        if prev is not docs:
            prev.unpersist()
        funnel.append({"stage": "quality", "n_in": n_in,
                       "n_dropped": n_in - n_q, "n_out": n_q})
        n_in = n_q

    if dedup:
        corpus = cur.filter(F.length(F.trim(text)) > 0)
        pairs = minhash_lsh_pairs(
            corpus, id_col, text, n_hashes=8, bands=4,
            threshold=dedup_threshold, max_bucket_size=dedup_max_bucket,
        )
        dup_ids = duplicate_clusters(pairs).filter(
            F.col("doc_id") != F.col("cluster_id")
        ).select(F.col("doc_id").alias(id_col))
        n_dup = dup_ids.count()
        from .pipeline import BROADCAST_MAX_ROWS

        key = (
            F.broadcast(dup_ids)
            if n_dup <= BROADCAST_MAX_ROWS
            else dup_ids
        )
        prev = cur
        cur = cur.join(key, [id_col], "left_anti").cache()
        n_d = cur.count()
        if prev is not docs:
            prev.unpersist()
        funnel.append({"stage": "dedup", "n_in": n_in,
                       "n_dropped": n_in - n_d, "n_out": n_d})
        n_in = n_d

    if scrub_ngrams is not None:
        # Span-level dedup between doc-level dedup and the benchmark
        # probe: dedup drops whole near-copies, scrub removes the
        # boilerplate SPANS shared by the surviving, otherwise-distinct
        # docs (so decontamination and chunking see cleaned text).
        # keep_cols passthrough rides the scrub plan's existing
        # starts-attach — no second corpus-wide join on the id. A doc
        # whose text is entirely frequent spans scrubs to empty and is
        # dropped (that, not the rewrite, is the funnel attrition).
        # Scrubbed docs' text is the tokenizer-normalized join
        # (lowercase, single-space); untouched docs keep their bytes.
        if not isinstance(text_col, str):
            raise ValueError(
                "scrub_ngrams requires text_col to be a column name"
            )
        from ..operators.scrub import scrub_duplicated_ngrams

        others = [c for c in cur.columns if c != id_col]
        sc = scrub_duplicated_ngrams(
            cur,
            id_col,
            text_col,
            n=scrub_ngrams,
            min_docs=scrub_min_docs,
            keep_cols=others,
        )
        rewritten = sc.select(
            id_col,
            *[
                (
                    F.when(
                        F.col("n_removed") > 0, F.col("scrubbed_text")
                    )
                    .otherwise(F.col(text_col))
                    .alias(text_col)
                    if c == text_col
                    else F.col(c)
                )
                for c in others
            ],
            F.col("n_removed").alias("_pp_scrub_removed"),
        )
        # One scrub computation: stats (over pre-drop rows, so fully-
        # scrubbed docs still count) and the kept corpus both read the
        # short-lived rewritten cache.
        rewritten = rewritten.cache()
        scrub_stats = rewritten.agg(
            F.sum(
                F.when(F.col("_pp_scrub_removed") > 0, 1).otherwise(0)
            ).alias("n_docs_scrubbed"),
            F.sum("_pp_scrub_removed").alias("tokens_removed"),
        ).collect()[0]
        prev = cur
        cur = (
            rewritten.filter(F.length(F.trim(F.col(text_col))) > 0)
            .drop("_pp_scrub_removed")
            .select(*cur.columns)
            .cache()
        )
        n_s = cur.count()
        rewritten.unpersist()
        if prev is not docs:
            prev.unpersist()
        funnel.append({
            "stage": "scrub",
            "n_in": n_in,
            "n_dropped": n_in - n_s,
            "n_out": n_s,
            "n_docs_scrubbed": int(scrub_stats["n_docs_scrubbed"] or 0),
            "tokens_removed": int(scrub_stats["tokens_removed"] or 0),
        })
        n_in = n_s

    if benchmark is not None:
        bm = benchmark
        if isinstance(text_col, str) and bench_text_col != text_col:
            # contaminated_docs applies ONE text accessor to both
            # sides — align the benchmark's column name to it
            bm = benchmark.withColumnRenamed(bench_text_col, text_col)
        contaminated = contaminated_docs(
            cur, bm, id_col=id_col, text_col=text,
            n=ngram, broadcast_grams=True,
        ).select(id_col)
        prev = cur
        cur = cur.join(contaminated, [id_col], "left_anti").cache()
        n_c = cur.count()
        if prev is not docs:
            prev.unpersist()
        funnel.append({"stage": "decontaminate", "n_in": n_in,
                       "n_dropped": n_in - n_c, "n_out": n_c})
        n_in = n_c

    packed = None
    packing = None
    if chunk_tokens is not None:
        # training-example assembly tail: sliding-window chunking
        # (row-local, fuses into the scan) then greedy in-order pack
        # assignment within deterministic hash shards (pack_chunks's
        # one exchange; shard count bounds group size independently of
        # corpus size — a shard is a unit of packing work, and packs
        # never span shards so the assignment is embarrassingly
        # parallel and reproducible across partitionings).
        from ..operators.sample import chunk_documents, pack_chunks

        chunks = chunk_documents(
            cur.withColumn("_pp_text", text).filter(
                F.length(F.trim("_pp_text")) > 0
            ),
            id_col,
            "_pp_text",
            chunk_tokens=chunk_tokens,
            stride=chunk_stride,
        )
        # chunk/pack counts live in `packing`, NOT the funnel: the
        # funnel is doc-attrition accounting (n_in − n_dropped ==
        # n_out), and chunks are a different unit.
        packing = {"chunk_tokens": chunk_tokens, "n_docs_in": n_in}
        if pack_budget is None:
            packing["n_chunks"] = chunks.count()
        else:
            sharded = chunks.withColumn(
                "shard",
                F.pmod(
                    F.xxhash64(F.col(id_col).cast("string")),
                    F.lit(pack_shards),
                ),
            )
            packed = pack_chunks(
                sharded,
                "shard",
                [id_col, "chunk_idx"],
                budget=pack_budget,
            )
            stats = packed.groupBy("shard", "pack_id").agg(
                F.sum("n_tokens").alias("pack_tokens"),
                F.count("*").alias("n_chunks"),
            ).agg(
                F.count("*").alias("n_packs"),
                F.sum("pack_tokens").alias("total_tokens"),
                F.sum("n_chunks").alias("n_chunks"),
                F.max("pack_tokens").alias("max_pack_tokens"),
                F.round(
                    F.avg(F.col("pack_tokens") / F.lit(float(pack_budget))),
                    4,
                ).alias("mean_fill"),
            ).collect()[0]
            packing.update(
                {
                    "budget": pack_budget,
                    "shards": pack_shards,
                    **{k: stats[k] for k in stats.asDict()},
                }
            )

    return PreprocessResult(
        kept=cur, funnel=funnel, packed=packed, packing=packing
    )
