"""Probabilistic record linkage (Fellegi–Sunter): blocked candidate
pairs scored by per-field agreement log-likelihood weights.

Classic public formulation (Fellegi & Sunter 1969): for each compared
field ``f`` with match probability ``m_f = P(agree | same entity)``
and chance-agreement probability ``u_f = P(agree | different
entities)``, an agreeing pair earns ``log2(m_f / u_f)`` and a
disagreeing pair ``log2((1-m_f) / (1-u_f))`` (negative); the pair
score is the sum and two thresholds split match / possible / non-match.
The m/u priors are either DECLARED by the caller (the deterministic
tier the oracle replays) or FITTED unsupervised with ``fs_fit_em`` —
Winkler's EM over agreement-pattern counts, whose cluster-wide cost
is one groupBy collapsing all pairs to <= 2^|fields| rows.

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


def fs_fit_em(
    pairs: DataFrame,
    field_names: list[str],
    iters: int = 20,
    init_match_rate: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> dict:
    """Fit Fellegi-Sunter m/u probabilities by EM over agreement
    PATTERNS — the standard unsupervised estimator (Winkler's EM for
    the FS model, public literature), shaped for scale: the only
    cluster-wide pass is ONE groupBy over the candidate pairs'
    boolean agreement columns, collapsing them to at most
    2^|fields| pattern-count rows; the EM loop then iterates
    driver-side on that tiny table. A billion pairs cost the same
    driver work as a thousand.

    Assumes conditional independence of fields given match status
    (the classic FS assumption). Returns {'fields': {name: (m, u)},
    'match_rate': p, 'n_pairs': n} — feed the fitted values back into
    ``LinkField``/``fellegi_sunter`` for scoring. Degenerate fits are
    clamped to (1e-6, 1-1e-6) so downstream log-weights stay finite.
    """
    counts = [
        (tuple(bool(r[f]) for f in field_names), r["__n"])
        for r in pairs.groupBy(
            *[F.coalesce(F.col(f), F.lit(False)).alias(f) for f in field_names]
        )
        .agg(F.count("*").alias("__n"))
        .collect()
    ]
    n = sum(c for _, c in counts)
    if n == 0:
        raise ValueError("no candidate pairs to fit on")
    k = len(field_names)
    p = init_match_rate
    m = [init_m] * k
    u = [init_u] * k
    clamp = lambda x: min(1.0 - 1e-6, max(1e-6, x))
    for _ in range(iters):
        # E-step: P(match | pattern) per distinct pattern
        m_new = [0.0] * k
        u_new = [0.0] * k
        pm_tot = 0.0
        for pat, c in counts:
            lm = p
            lu = 1.0 - p
            for j in range(k):
                lm *= m[j] if pat[j] else (1.0 - m[j])
                lu *= u[j] if pat[j] else (1.0 - u[j])
            g = lm / (lm + lu) if (lm + lu) > 0 else 0.0
            pm_tot += g * c
            for j in range(k):
                if pat[j]:
                    m_new[j] += g * c
                    u_new[j] += (1.0 - g) * c
        # M-step
        if pm_tot <= 0 or pm_tot >= n:
            break
        m = [clamp(m_new[j] / pm_tot) for j in range(k)]
        u = [clamp(u_new[j] / (n - pm_tot)) for j in range(k)]
        p = clamp(pm_tot / n)
    return {
        "fields": {f: (m[j], u[j]) for j, f in enumerate(field_names)},
        "match_rate": p,
        "n_pairs": n,
    }
