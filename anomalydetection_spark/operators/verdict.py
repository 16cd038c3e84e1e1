"""Verdict assembly: threshold filter, score normalization, similarity
grouping, top-k report.

Mirrors the reference's output stage semantics:
- F11 threshold predicate (``prediction == -1 AND score < threshold``,
  /root/reference/model_manager.py:222, ensemble_model.py:386)
- A5 min/max score normalization to an "anomaly probability %"
  (``100 - (score-min)/(max-min)*100``, model_manager.py:255,
  ensemble_model.py:414) — reference carries global min/max across
  batches imperatively (:213-215); here it's a single unpartitioned
  window / 1-row-agg cross join.
- A11 greedy similarity grouping (model_manager.py:252-267): order-
  dependent and non-associative, so exact parity holds only *within* a
  deterministically ordered bounded group — we first group by an exact
  key (check, partition), then run the greedy pass per group in
  ``applyInPandas``; the cross-group semantic delta is documented.
- A12 top-k ordered report (model_manager.py:269-280).
"""

from __future__ import annotations

import difflib
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def threshold_violations(
    scored: DataFrame, score_col: str = "score", threshold: float = 0.0
) -> DataFrame:
    """F11: rows whose score falls below the threshold are violations."""
    return scored.filter(F.col(score_col) < F.lit(threshold))


def normalize_scores(
    df: DataFrame, score_col: str = "score", out_col: str = "anomaly_pct"
) -> DataFrame:
    """A5: 100 - (score-min)/(max-min)*100 over the whole frame.

    Computed via a 1-row global aggregate cross-joined back (cheaper
    than an unpartitioned window: no single-reducer sort, and the agg
    is partial-aggregated map-side)."""
    mm = df.agg(
        F.min(score_col).alias("_mn"), F.max(score_col).alias("_mx")
    )
    return (
        df.crossJoin(F.broadcast(mm))
        .withColumn(
            out_col,
            F.when(
                F.col("_mx") == F.col("_mn"), F.lit(0.0)
            ).otherwise(
                F.lit(100.0)
                - (F.col(score_col) - F.col("_mn"))
                / (F.col("_mx") - F.col("_mn"))
                * 100.0
            ),
        )
        .drop("_mn", "_mx")
    )


def _greedy_group(pdf: pd.DataFrame, text_col: str, ratio_threshold: float,
                  max_candidates: int) -> pd.DataFrame:
    """Reference-faithful greedy pass (model_manager.py:252-267): for
    each row in deterministic order, join the first existing group whose
    exemplar is similar enough, else open a new group. Keeps the
    max-score exemplar per group and the member count.

    Deterministic order is score DESC then text ASC — so when a group
    exceeds ``max_candidates`` the truncation drops the LOWEST-score
    rows (an earlier text-alphabetical order could silently discard
    the max-score exemplar and mis-rank the whole report). NULL texts
    cannot be compared and are dropped before grouping; NULL scores
    participate as -inf (never chosen as exemplar)."""
    pdf = pdf[pdf[text_col].notna()].copy()
    if len(pdf) == 0:
        return pd.DataFrame(
            columns=["group_key", "exemplar", "best_score", "n_members"]
        )
    pdf["score"] = pdf["score"].fillna(float("-inf"))
    pdf = pdf.sort_values(
        ["score", text_col], ascending=[False, True]
    ).reset_index(drop=True)
    if len(pdf) > max_candidates:
        pdf = pdf.iloc[:max_candidates]
    exemplars: list[tuple[str, float, int]] = []  # text, best_score, count
    assign: list[int] = []
    for text, score in zip(pdf[text_col], pdf["score"]):
        gid = -1
        for i, (etext, _, _) in enumerate(exemplars):
            if difflib.SequenceMatcher(None, text, etext).ratio() >= ratio_threshold:
                gid = i
                break
        if gid == -1:
            exemplars.append((text, score, 1))
            gid = len(exemplars) - 1
        else:
            et, es, ec = exemplars[gid]
            exemplars[gid] = (et if es >= score else text, max(es, score), ec + 1)
        assign.append(gid)
    rows = [
        {
            "group_key": pdf["group_key"].iloc[0],
            "exemplar": t,
            "best_score": s,
            "n_members": c,
        }
        for (t, s, c) in exemplars
    ]
    return pd.DataFrame(rows)


def similarity_groups(
    violations: DataFrame,
    text_col: str,
    group_cols: Iterable[str],
    ratio_threshold: float = 0.85,
    max_candidates: int = 1000,
) -> DataFrame:
    """A11: exact-key grouping first (captures most duplicates, fully
    distributed), then the greedy similarity pass within each bounded
    group via applyInPandas. ``score`` column required."""
    gk = F.concat_ws("§", *[F.col(c).cast("string") for c in group_cols])
    prepared = violations.withColumn("group_key", gk).select(
        "group_key", F.col(text_col).alias("text"), F.col("score").cast("double")
    )

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        return _greedy_group(pdf, "text", ratio_threshold, max_candidates)

    return prepared.groupBy("group_key").applyInPandas(
        run,
        schema="group_key string, exemplar string, best_score double, n_members long",
    )


def top_k_report(
    groups: DataFrame,
    order_col: str = "best_score",
    k: int = 20,
    truncate_chars: int = 100,
    text_col: str = "exemplar",
) -> DataFrame:
    """A12 + F7: top-k groups by score, exemplar truncated to 100 chars
    with '...' (main.py:120-130)."""
    truncated = F.when(
        F.length(text_col) > truncate_chars,
        F.concat(F.substring(text_col, 1, truncate_chars), F.lit("...")),
    ).otherwise(F.col(text_col))
    return (
        groups.withColumn(text_col, truncated)
        .orderBy(F.desc(order_col), text_col)
        .limit(k)
    )


def global_verdict(partition_verdicts: DataFrame) -> DataFrame:
    """Two-level verdict (SURVEY.md §3.3): roll per-partition verdicts
    up to one table-level row per check (partition_id = null)."""
    return partition_verdicts.groupBy("check").agg(
        F.lit(None).cast("int").alias("partition_id"),
        F.sum("n_rows").alias("n_rows"),
        F.sum("n_violations").alias("n_violations"),
        (F.sum("n_violations") / F.sum("n_rows")).alias("violation_rate"),
        F.max("score").alias("score"),
        F.when(F.sum(F.when(F.col("verdict") == "fail", 1).otherwise(0)) > 0, "fail")
        .otherwise("pass")
        .alias("verdict"),
    ).select(
        "check",
        "partition_id",
        "n_rows",
        "n_violations",
        "violation_rate",
        "score",
        "verdict",
    )
