"""Sparse lexical retrieval: BM25 top-k over a document corpus.

The training-data-pipeline use (no reference analog — this is the
retrieval sibling of the ANN family in operators/ann.py): given a set
of probe queries, rank documents by BM25 (Robertson & Zaragoza 2009,
the Okapi formulation with the +1 idf floor used by Lucene) — the
standard first-stage retriever for decontamination probes, eval-set
leakage sweeps, and targeted corpus audits ("which training docs score
highest for this benchmark question?").

Scale shape: the posting join is ``term -> docs containing term``, so
only documents sharing at least one query term are ever scored — the
corpus-wide scan is one tokenize + groupBy; the per-(query, doc) score
aggregation shuffles on (query_id, doc_id) which is bounded by postings
of the query terms, not the corpus; top-k is a window per query_id
(WindowGroupLimit pushes the limit into the sort). Term statistics
(df, idf) are computed corpus-wide but semi-joined down to the query
terms BEFORE broadcasting — the full vocabulary table grows with the
corpus (Heaps' law) and must never broadcast. The doc-length join
shuffles (doc_id, dl) pairs — narrow, corpus-row-count-bounded. Zero
Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 4,
) -> DataFrame:
    """(query_id, doc_id, rank, score): top-k BM25 docs per query.

    score(d, q) = Σ_{t∈q} ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                  · tf_td (k1+1) / (tf_td + k1 (1 - b + b·|d|/avgdl))

    Ranking is on the ROUNDED score with ascending-doc_id tie-break,
    so ranks are bit-deterministic across engines (two docs whose true
    scores differ below round_to precision would otherwise rank by
    last-ulp summation-order noise).
    A doc scores only if it shares ≥1 term with the query — docs with
    zero overlap never enter the plan.
    """
    toks = F.split(F.lower(F.trim(text_col)), " ")
    t = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok")
    ).filter(F.length("tok") > 0)
    tf = t.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    dl = t.groupBy("doc_id").agg(F.count("*").alias("dl"))
    n_stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    # query terms get the SAME lower/trim convention as the doc side —
    # terms lifted from raw benchmark text carry mixed case, and an
    # unnormalized term silently matches nothing (the leakage sweep
    # would under-report with no error)
    qt = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(terms_col).alias("_raw_tok"),
        )
        .select(
            "query_id", F.lower(F.trim("_raw_tok")).alias("tok")
        )
        .filter(F.length("tok") > 0)
        .distinct()
    )
    # df stats restricted to query terms BEFORE the broadcast: the full
    # dfreq table is vocabulary-sized (grows with the corpus, Heaps'
    # law), but only |query terms| rows of it can ever contribute.
    dfreq_q = dfreq.join(
        F.broadcast(qt.select("tok").distinct()), "tok", "left_semi"
    )
    scored = (
        tf.join(F.broadcast(qt), "tok")
        .join(F.broadcast(dfreq_q), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n_stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * (k1 + 1))
            / (
                F.col("tf")
                + k1
                * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum("term_score"), round_to).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank", "score")
    )
