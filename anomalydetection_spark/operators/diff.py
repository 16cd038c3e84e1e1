"""Snapshot row-diff: key-aligned comparison of two table versions.

The validation-engine counterpart of a "data diff" tool: given two
snapshots of the same logical table (yesterday's Iceberg snapshot vs
today's, a pre-backfill vs post-backfill copy), classify every key as
added / removed / changed / unchanged and profile WHICH columns
changed.  The reference's poll loop refits models on every file and
has no notion of comparing two states of the data itself
(/root/reference/model_manager.py:154-198 rebuilds from scratch); this
operator gives the drift family a row-level, key-exact complement to
the distributional checks in operators/drift.py.

Scale shape (the 10^12-row design point):

- ONE full outer join on the key columns. Both sides shuffle once on
  the key; with unique keys there is no skew by construction, and on
  a real cluster both snapshots of the same Iceberg table are
  typically bucketed/sorted by the key already, so the exchange
  elides (storage-partitioned join). AQE handles the residual case.
- All column comparisons are row-local null-safe equality (`<=>`)
  on the joined row — no second pass, no per-column shuffles.
- The summary aggregations are map-side combinable counts: the
  status rollup carries <=4 partial rows per task and the per-column
  changed profile <=|compare_cols| rows per task.
- Changed/added/removed rows stream out as a filtered projection of
  the SAME joined plan — callers that only want the summary never
  materialize them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATUS_ADDED = "added"
STATUS_REMOVED = "removed"
STATUS_CHANGED = "changed"
STATUS_UNCHANGED = "unchanged"


def _as_list(cols: str | list[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def snapshot_diff(
    left: DataFrame,
    right: DataFrame,
    key_cols: str | list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Classify every key across two snapshots.

    Returns one row per key present in either side with columns:
    the key columns, ``diff_status`` (added/removed/changed/unchanged
    — added means present only in ``right``), and ``changed_cols``
    (sorted array of compare-column names whose values differ
    null-safely; empty unless status is 'changed').

    ``compare_cols`` defaults to every non-key column present in BOTH
    schemas (column-set changes are a schema-contract concern —
    operators/contract.py::schema_diff — not a row-diff one).
    """
    keys = _as_list(key_cols)
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in keys]
    if not compare_cols:
        raise ValueError("snapshot_diff: no columns to compare")

    l = left.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_left"),
        *[F.col(c).alias(f"__l_{c}") for c in compare_cols],
    )
    r = right.select(
        *[F.col(k).alias(k) for k in keys],
        F.lit(True).alias("__in_right"),
        *[F.col(c).alias(f"__r_{c}") for c in compare_cols],
    )
    j = l.join(r, on=keys, how="full_outer")

    # Row-local, null-safe per-column comparison; the array is built
    # once and reused by both the status and the changed_cols output.
    changed_arr = F.array_sort(
        F.filter(
            F.array(
                *[
                    F.when(
                        ~F.col(f"__l_{c}").eqNullSafe(F.col(f"__r_{c}")),
                        F.lit(c),
                    )
                    for c in compare_cols
                ]
            ),
            lambda x: x.isNotNull(),
        )
    )
    status = (
        F.when(F.col("__in_left").isNull(), F.lit(STATUS_ADDED))
        .when(F.col("__in_right").isNull(), F.lit(STATUS_REMOVED))
        .when(F.size(F.col("changed_cols")) > 0, F.lit(STATUS_CHANGED))
        .otherwise(F.lit(STATUS_UNCHANGED))
    )
    return (
        j.withColumn("changed_cols", changed_arr)
        .withColumn("diff_status", status)
        # added/removed rows carry spurious "changed" column names
        # (one side is all-NULL) — scope the profile to real changes
        .withColumn(
            "changed_cols",
            F.when(
                F.col("diff_status") == STATUS_CHANGED, F.col("changed_cols")
            ).otherwise(F.array().cast("array<string>")),
        )
        .select(*keys, "diff_status", "changed_cols")
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Roll a snapshot_diff result up to (kind, name, n) telemetry rows:
    kind='status' rows count keys per diff_status; kind='column' rows
    count, per compare column, how many changed keys touched it.

    ONE pass over the upstream join: each row explodes into its status
    tag plus one tag per changed column, then a single map-side
    combinable groupBy. (The naive two-branch union re-evaluates the
    full outer join once per branch — 2x the dominant cost at scale.)"""
    tags = F.concat(
        F.array(
            F.struct(
                F.lit("status").alias("kind"),
                F.col("diff_status").alias("name"),
            )
        ),
        F.transform(
            "changed_cols",
            lambda c: F.struct(
                F.lit("column").alias("kind"), c.alias("name")
            ),
        ),
    )
    return (
        diff.select(F.explode(tags).alias("t"))
        .groupBy(F.col("t.kind").alias("kind"), F.col("t.name").alias("name"))
        .agg(F.count("*").cast("long").alias("n"))
    )


def join_diagnostics(
    left: DataFrame,
    right: DataFrame,
    left_keys: str | list[str],
    right_keys: str | list[str] | None = None,
) -> DataFrame:
    """Pre-join diagnostics: key coverage and fanout estimation for a
    prospective equi-join, WITHOUT running the join.

    At the 10^12-row design point the most expensive mistake is an
    unprofiled join: an unmatched-key-heavy side wastes a full
    shuffle, and a high-fanout key silently explodes the output
    (|out| = sum over matched keys of n_left*n_right). This operator
    answers, from two cheap aggregations, the questions a planner
    (or a human) asks before committing to the join strategy:

    - coverage: what fraction of each side's ROWS (and distinct keys)
      will find a partner — the referential-integrity rates of
      operators/referential.py generalized to both directions;
    - size: the EXACT join output cardinality and the worst single
      key's contribution (max n_left*n_right) — the skew signal that
      decides salting / AQE skew-join handling;
    - amplification: output rows per matched left row (>1 means the
      right side fans out and a broadcast of pre-aggregated right
      partials may beat the row join).

    Cost shape: one map-side-combinable count agg per side (shuffle
    carries |distinct keys| partial rows, not data rows), one join of
    the two per-key count tables (rows are ~24 bytes each), one final
    single-row rollup. Never touches a data row twice, never
    materializes the join.

    Returns ONE row; all counts exact longs, rates rounded 6dp.
    """
    lk = _as_list(left_keys)
    rk = _as_list(right_keys) if right_keys is not None else lk
    if len(lk) != len(rk):
        raise ValueError(f"key arity mismatch: {lk} vs {rk}")
    kcols = [f"k{i}" for i in range(len(lk))]
    lcnt = (
        left.select(*[F.col(c).alias(k) for c, k in zip(lk, kcols)])
        .groupBy(*kcols)
        .agg(F.count("*").alias("nl"))
    )
    rcnt = (
        right.select(*[F.col(c).alias(k) for c, k in zip(rk, kcols)])
        .groupBy(*kcols)
        .agg(F.count("*").alias("nr"))
    )
    j = lcnt.join(rcnt, kcols, "full_outer")
    matched = F.col("nl").isNotNull() & F.col("nr").isNotNull()
    out_rows = F.when(matched, F.col("nl") * F.col("nr")).otherwise(F.lit(0))
    agg = j.agg(
        F.coalesce(F.sum("nl"), F.lit(0)).alias("left_rows"),
        F.coalesce(F.sum("nr"), F.lit(0)).alias("right_rows"),
        F.count(F.when(F.col("nl").isNotNull(), 1)).alias("left_keys"),
        F.count(F.when(F.col("nr").isNotNull(), 1)).alias("right_keys"),
        F.count(F.when(matched, 1)).alias("matched_keys"),
        F.coalesce(F.sum(F.when(matched, F.col("nl"))), F.lit(0)).alias(
            "left_rows_matched"
        ),
        F.coalesce(F.sum(F.when(matched, F.col("nr"))), F.lit(0)).alias(
            "right_rows_matched"
        ),
        F.coalesce(F.sum(out_rows), F.lit(0)).alias("join_output_rows"),
        F.coalesce(F.max(out_rows), F.lit(0)).alias("max_key_output_rows"),
    )
    safe = lambda num, den: F.round(  # noqa: E731
        F.when(F.col(den) > 0, F.col(num) / F.col(den)).otherwise(F.lit(0.0)),
        6,
    )
    return agg.select(
        "left_rows",
        "right_rows",
        "left_keys",
        "right_keys",
        "matched_keys",
        (F.col("left_keys") - F.col("matched_keys")).alias("left_only_keys"),
        (F.col("right_keys") - F.col("matched_keys")).alias("right_only_keys"),
        safe("left_rows_matched", "left_rows").alias("left_row_coverage"),
        safe("right_rows_matched", "right_rows").alias("right_row_coverage"),
        "join_output_rows",
        "max_key_output_rows",
        safe("join_output_rows", "left_rows_matched").alias(
            "fanout_per_left_row"
        ),
    )
