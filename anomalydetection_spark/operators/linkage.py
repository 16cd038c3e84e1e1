"""Probabilistic record linkage (Fellegi–Sunter): blocked candidate
pairs scored by per-field agreement log-likelihood weights.

Classic public formulation (Fellegi & Sunter 1969): for each compared
field ``f`` with match probability ``m_f = P(agree | same entity)``
and chance-agreement probability ``u_f = P(agree | different
entities)``, an agreeing pair earns ``log2(m_f / u_f)`` and a
disagreeing pair ``log2((1-m_f) / (1-u_f))`` (negative); the pair
score is the sum and two thresholds split match / possible / non-match.
The m/u priors here are DECLARED by the caller (no EM fitting — the
deterministic tier the oracle can replay; an EM loop would sit on top
of exactly this scoring pass).

Plan shape: one hash-shuffle self-join on the blocking keys
(candidate count is sum over blocks of C(|block|, 2) — the caller's
blocking choice IS the scale knob, same contract as the LSH band
join), then row-local agreement expressions and a literal-weight sum;
no UDF, no second shuffle. Completes the dedup family's decision
layer: LSH/setsim find textual near-dups, this scores STRUCTURED
row pairs, golden-record consolidation (operators/consolidate.py)
then merges the clusters it certifies.

Reference tie-in: the reference scores log-line pairs with a
similarity ratio and fixed thresholds (model_manager.py:315-335);
this is the same decide-by-threshold shape with field-level
likelihood weights instead of one string ratio.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LinkField:
    """One compared field: ``agree_expr`` is a SQL boolean over the
    pair row, where the two sides' columns appear as ``a_<col>`` and
    ``b_<col>``. NULL agreement counts as disagreement (conservative:
    absent evidence never raises the score)."""

    name: str
    agree_expr: str
    m: float
    u: float

    def weights(self) -> tuple[float, float]:
        if not (0.0 < self.u < self.m < 1.0):
            raise ValueError(
                f"field {self.name!r}: need 0 < u < m < 1, "
                f"got m={self.m} u={self.u}"
            )
        return (
            math.log2(self.m / self.u),
            math.log2((1.0 - self.m) / (1.0 - self.u)),
        )


def exact(col: str) -> str:
    return f"a_{col} <=> b_{col} AND a_{col} IS NOT NULL"

def within(col: str, tol: float) -> str:
    return f"abs(a_{col} - b_{col}) <= {tol}"

def prefix(col: str, n: int) -> str:
    return f"substring(a_{col}, 1, {n}) = substring(b_{col}, 1, {n})"


def fellegi_sunter(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[LinkField],
    upper: float = 2.0,
    lower: float = 0.0,
) -> DataFrame:
    """Score all intra-block pairs; returns one row per candidate pair
    with per-field agreement flags, the summed log2-likelihood
    ``score``, and ``match_class`` in {'match','possible','non_match'}.
    """
    cols = {id_col, *block_cols}
    for f_ in fields:
        for tok in f_.agree_expr.replace("(", " ").replace(")", " ").split():
            if tok.startswith("a_") or tok.startswith("b_"):
                cols.add(tok[2:].rstrip(","))
    present = [c for c in cols if c in df.columns]
    a = df.select(
        *[F.col(c).alias(f"a_{c}") for c in present]
    )
    b = df.select(
        *[F.col(c).alias(f"b_{c}") for c in present]
    )
    cond = [F.col(f"a_{c}") == F.col(f"b_{c}") for c in block_cols]
    pairs = a.join(b, cond).filter(
        F.col(f"a_{id_col}") < F.col(f"b_{id_col}")
    )
    score = F.lit(0.0)
    out_cols: list[Column] = [
        F.col(f"a_{id_col}").alias("id_a"),
        F.col(f"b_{id_col}").alias("id_b"),
    ]
    for f_ in fields:
        w_agree, w_disagree = f_.weights()
        agree = F.coalesce(F.expr(f_.agree_expr), F.lit(False))
        pairs = pairs.withColumn(f"agree_{f_.name}", agree)
        out_cols.append(F.col(f"agree_{f_.name}"))
        score = score + F.when(
            F.col(f"agree_{f_.name}"), F.lit(w_agree)
        ).otherwise(F.lit(w_disagree))
    pairs = pairs.withColumn("score", score)
    return pairs.select(
        *out_cols,
        F.col("score"),
        F.when(F.col("score") >= upper, F.lit("match"))
        .when(F.col("score") >= lower, F.lit("possible"))
        .otherwise(F.lit("non_match"))
        .alias("match_class"),
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    id_col: str,
    sort_expr,
    window: int = 3,
    partition_expr=None,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernandez/Stolfo merge-purge):
    order the records by a fuzzy-tolerant sort key and pair each row
    with its next ``window`` neighbors — the ER candidate generator
    for fields where equality blocking fails (typos in the block key
    kill hash blocks; a sort key like soundex/prefix keeps
    near-values ADJACENT instead of equal). Complements
    ``fellegi_sunter``: generate candidates here, score them there.

    Plan: rank within optional coarse partitions (one window — at
    scale pass ``partition_expr`` so the sort never runs unpartitioned
    over the full table; neighbors never pair across partitions, the
    standard multi-pass mitigation is a second call with a different
    key), explode the +1..+window offsets, self-join on the rank —
    shuffle is window x n rows, never n^2. Output: (id_a, id_b,
    distance) with distance = rank gap in [1, window], deterministic
    by (sort key, id) tie-break."""
    se = F.expr(sort_expr) if isinstance(sort_expr, str) else sort_expr
    part = (
        (F.expr(partition_expr) if isinstance(partition_expr, str) else partition_expr)
        if partition_expr is not None
        else F.lit(0)
    )
    ranked = df.select(
        F.col(id_col).alias("_id"),
        part.alias("_p"),
        F.row_number().over(
            Window.partitionBy(part).orderBy(se.asc(), F.col(id_col).asc())
        ).alias("_rn"),
    )
    probes = ranked.select(
        "_p",
        F.col("_id").alias("id_a"),
        F.explode(F.expr(f"sequence(1, {window})")).alias("distance"),
        F.col("_rn").alias("_rn0"),
    ).select(
        "_p", "id_a", "distance", (F.col("_rn0") + F.col("distance")).alias("_rn")
    )
    right = ranked.select("_p", F.col("_id").alias("id_b"), "_rn")
    return probes.join(right, ["_p", "_rn"]).select(
        "id_a", "id_b", F.col("distance").cast("long").alias("distance")
    )
