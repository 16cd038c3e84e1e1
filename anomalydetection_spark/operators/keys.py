"""Key and dependency discovery: candidate-key mining (which declared
column combos uniquely identify rows) and approximate-FD confidence
(how close X -> Y is to holding, by the g3 measure).

Together with ``inclusion.inclusion_dependencies`` (candidate foreign
keys) this completes the profile-driven schema-discovery triad a
validation engine needs before it can SUGGEST constraints: keys in,
references out, dependencies between columns — all from data, all as
single stacked aggregate passes.

Candidates are DECLARED (the caller picks combos/pairs worth testing,
typically from profile heuristics); the lattice search of full
TANE/HyFD is out of scope — what matters at 100 TB is that testing a
candidate SET costs ONE pass, not one pass per candidate:

- ``candidate_keys``: every combo's rows stack into one
  (combo_id, key-tuple) relation -> one map-side-combinable
  two-level agg. Uniqueness follows Deequ's isUnique convention:
  distinct count compared against NON-NULL rows (a row with any null
  member can't claim identity), with the null count reported so the
  caller sees what was excluded. Minimality is judged against the
  declared candidate set (driver-side, |combos| rows).
- ``afd_confidence``: g3 = (sum over lhs groups of the majority rhs
  count) / n — the fraction of rows that survive if each group keeps
  only its most common rhs; 1.0 iff the FD holds exactly. Stacked
  (pair_id, lhs, rhs) -> count -> per-group max -> per-pair sum:
  three shuffle levels whose width shrinks at each step (pairs,
  groups, 1 row per pair).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEP = "\x1f"  # unit separator: ("ab","c") must not collide with ("a","bc")


def candidate_keys(
    spark: SparkSession, df: DataFrame, candidates: list[list[str]]
) -> DataFrame:
    """One row per declared combo: combo, n_rows, n_withnull,
    n_distinct (over non-null rows), is_unique, is_minimal_key."""
    if not candidates:
        raise ValueError("declare at least one candidate combo")
    stacked = None
    for cid, combo in enumerate(candidates):
        nn = df
        for c in combo:
            nn = nn.filter(F.col(c).isNotNull())
        rows = nn.select(
            F.lit(cid).alias("cid"),
            F.concat_ws(
                SEP, *[F.col(c).cast("string") for c in combo]
            ).alias("key"),
        )
        stacked = rows if stacked is None else stacked.unionByName(rows)
    per_key = stacked.groupBy("cid", "key").agg(F.count("*").alias("c"))
    per_combo = {
        r["cid"]: r
        for r in per_key.groupBy("cid")
        .agg(
            F.sum("c").alias("n_nonnull"),
            F.count("*").alias("n_distinct"),
        )
        .collect()
    }
    n_rows = df.count()
    uniq: dict[int, bool] = {}
    out_rows = []
    for cid, combo in enumerate(candidates):
        r = per_combo.get(cid)
        n_nonnull = r["n_nonnull"] if r else 0
        n_distinct = r["n_distinct"] if r else 0
        uniq[cid] = n_nonnull > 0 and n_distinct == n_nonnull
    for cid, combo in enumerate(candidates):
        sub_unique = any(
            uniq[j]
            and set(candidates[j]) < set(combo)
            for j in range(len(candidates))
        )
        r = per_combo.get(cid)
        n_nonnull = r["n_nonnull"] if r else 0
        n_distinct = r["n_distinct"] if r else 0
        out_rows.append(
            (
                ",".join(combo),
                int(n_rows),
                int(n_rows - n_nonnull),
                int(n_distinct),
                bool(uniq[cid]),
                bool(uniq[cid] and not sub_unique),
            )
        )
    return spark.createDataFrame(
        out_rows,
        "combo string, n_rows long, n_withnull long, n_distinct long, "
        "is_unique boolean, is_minimal_key boolean",
    )


def afd_confidence(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """g3 confidence for each declared (lhs -> rhs) pair; rows with a
    NULL on either side are excluded (and counted). Output: fd,
    n_rows, n_groups, confidence (6dp), holds."""
    if not pairs:
        raise ValueError("declare at least one (lhs, rhs) pair")
    stacked = None
    for pid, (lhs, rhs) in enumerate(pairs):
        rows = (
            df.filter(F.col(lhs).isNotNull() & F.col(rhs).isNotNull())
            .select(
                F.lit(pid).alias("pid"),
                F.col(lhs).cast("string").alias("lhs"),
                F.col(rhs).cast("string").alias("rhs"),
            )
        )
        stacked = rows if stacked is None else stacked.unionByName(rows)
    per_val = stacked.groupBy("pid", "lhs", "rhs").agg(
        F.count("*").alias("c")
    )
    per_grp = per_val.groupBy("pid", "lhs").agg(
        F.max("c").alias("keep"), F.sum("c").alias("tot")
    )
    per_pair = per_grp.groupBy("pid").agg(
        F.sum("tot").alias("n_rows"),
        F.count("*").alias("n_groups"),
        F.round(F.sum("keep") / F.sum("tot"), 6).alias("confidence"),
    )
    names = F.array(
        *[F.lit(f"{lhs}->{rhs}") for lhs, rhs in pairs]
    )
    return per_pair.select(
        F.element_at(names, F.col("pid") + 1).alias("fd"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_groups").cast("long").alias("n_groups"),
        "confidence",
        (F.col("confidence") >= 1.0).alias("holds"),
    )
