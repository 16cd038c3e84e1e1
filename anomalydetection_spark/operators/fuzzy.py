"""Exact edit-similarity join with lossless segment (pigeonhole)
filtering — the edit-distance complement to the set-similarity prefix
join (``dedup.setsim_prefix_pairs``) and the scalable form of the
bounded all-pairs Levenshtein tier (reference behavior:
model_manager.py:315-325, which scores every snippet pair with a
Python-level ``difflib``/distance loop).

Scheme (PassJoin, Li/Deng/Feng — public literature): split every
string of length ``L`` into ``k+1`` contiguous segments. If
``ed(s, t) <= k`` then at least one of ``s``'s segments appears in
``t`` VERBATIM (pigeonhole: k edits cannot touch all k+1 segments),
shifted by at most ``k`` positions. So:

- index side: each string emits its ``k+1`` segments keyed by
  ``(source_length, segment_index, segment_text)`` — O(n*(k+1)) rows;
- probe side: each string ``t`` (length ``m``) enumerates, for every
  candidate indexed length ``L`` in ``[m-k, m]`` (the join is
  canonicalized so the indexed string is never longer than the probe),
  the substrings of ``t`` that could equal segment ``i`` of a
  length-``L`` string: the segment's length at start positions within
  ``±k`` of the segment's home position — O(n*(k+1)^2*(2k+1)) rows,
  a constant ~12x blow-up at k=1, ~45x at k=2, independent of n;
- equi-join on ``(L, i, text)`` produces a candidate superset,
  verified with the JVM built-in ``levenshtein(s, t, k)`` (early-exit
  threshold form). The filter is LOSSLESS: the join misses no true
  pair, so the output is exactly the brute-force result.

Every shuffle is linear in the corpus; nothing is quadratic unless the
TRUE result is. Hot segment values (shared prefixes across many rows)
bound the damage to sum(|bucket_index|*|bucket_probe|) per distinct
(L, i, text) key — callers joining id-like corpora with massive shared
prefixes should strip the constant prefix first (it carries no edit
signal).

Strings shorter than ``k+1`` characters cannot be split into ``k+1``
non-empty segments (an empty segment matches everywhere and the
pigeonhole argument degenerates); both sides therefore filter to
``length >= k+1`` and such rows never pair — declared, not silent:
the function raises if the caller's k makes that filter non-trivial
unless ``allow_short=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edit_similarity_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 1,
    allow_short: bool = False,
) -> DataFrame:
    """All pairs ``(id_a < id_b, edit_distance)`` with
    ``levenshtein(s_a, s_b) <= k``. Exact (lossless candidate filter).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    nseg = k + 1
    base = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(str_col).alias("_s"),
            F.length(str_col).alias("_len"),
        )
        .filter(F.col("_s").isNotNull())
    )
    short = base.filter(F.col("_len") < nseg)
    if not allow_short:
        n_short = short.limit(1).count()
        if n_short:
            raise ValueError(
                f"strings shorter than k+1={nseg} chars cannot "
                "participate in the segment filter; pre-filter them or "
                "pass allow_short=True to drop them silently"
            )
    base = base.filter(F.col("_len") >= nseg)

    # Segment layout for a string of length L split into k+1 parts:
    # rem = L % (k+1) segments of length base+1 at the END, the first
    # q = (k+1) - rem segments of length base. start_i (0-based) =
    # i*base + max(0, i - q). Both sides derive the layout from the
    # SAME integer arithmetic so the join keys agree bit-for-bit.
    seg = base.select(
        F.col("_id").alias("x_id"),
        F.col("_len").alias("ell"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {k}), i -> named_struct("
                f"  'i', i,"
                f"  'sub', substring(_s,"
                f"     1 + i * (_len div {nseg})"
                f"       + greatest(0, i - ({nseg} - _len % {nseg})),"
                f"     (_len div {nseg})"
                f"       + (case when i >= {nseg} - (_len % {nseg})"
                f"          then 1 else 0 end))))"
            )
        ).alias("e"),
    ).select("x_id", "ell", F.col("e.i").alias("i"), F.col("e.sub").alias("sub"))

    probe = (
        base.select(
            F.col("_id").alias("y_id"),
            "_s",
            F.col("_len").alias("m"),
            F.explode(
                F.sequence(
                    F.greatest(F.lit(nseg), F.col("_len") - k), F.col("_len")
                )
            ).alias("ell"),
        )
        .select(
            "y_id",
            "_s",
            "m",
            "ell",
            F.explode(F.sequence(F.lit(0), F.lit(k))).alias("i"),
        )
        .withColumn("base_l", F.expr(f"ell div {nseg}"))
        .withColumn("rem", F.expr(f"ell % {nseg}"))
        .withColumn(
            "seg_len",
            F.expr(f"base_l + (case when i >= {nseg} - rem then 1 else 0 end)"),
        )
        .withColumn(
            "start", F.expr(f"i * base_l + greatest(0, i - ({nseg} - rem))")
        )
        # valid substring start positions: within +-k of the segment's
        # home position, inside the probe string. Bounds are provably
        # non-empty and ascending for ell <= m (see module docstring).
        .withColumn(
            "p",
            F.explode(
                F.sequence(
                    F.greatest(F.lit(0), F.col("start") - k),
                    F.least(F.col("m") - F.col("seg_len"), F.col("start") + k),
                )
            ),
        )
        .select(
            "y_id",
            "ell",
            "i",
            F.expr("substring(_s, p + 1, seg_len)").alias("sub"),
        )
    )

    cand = (
        seg.join(probe, ["ell", "i", "sub"])
        .filter(F.col("x_id") != F.col("y_id"))
        .select(
            F.least("x_id", "y_id").alias("id_a"),
            F.greatest("x_id", "y_id").alias("id_b"),
        )
        .distinct()
    )

    sa = base.select(F.col("_id").alias("id_a"), F.col("_s").alias("s_a"))
    sb = base.select(F.col("_id").alias("id_b"), F.col("_s").alias("s_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        # threshold form early-exits at k+1 and returns -1 above it
        .withColumn("edit_distance", F.expr(f"levenshtein(s_a, s_b, {k})"))
        .filter(F.col("edit_distance") >= 0)
        .select(
            "id_a", "id_b", F.col("edit_distance").cast("long").alias("edit_distance")
        )
    )
