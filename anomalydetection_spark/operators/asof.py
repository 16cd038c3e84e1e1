"""As-of (point-in-time) join — the classic operator Spark's join
zoo lacks, built as a composition of existing DataFrame ops.

For every left row, attach the most recent right row with
``right_time <= left_time`` within the same key (ties at equal time
match inclusively, like DuckDB/kdb ASOF semantics). The naive
formulation is a range join (``l.t >= r.t`` inequality) whose pair
space explodes quadratically per key; the scalable shape used here is
the union-sort-fill plan:

    union both sides (right rows tagged 0, left rows tagged 1)
    → ONE shuffle on the key
    → per-key sort by (time, tag)   [right sorts before left at ties]
    → last(value, ignorenulls) over the running window
    → keep left rows

Cost: one hash exchange + an in-partition sort — the same bill as any
groupBy over the union, independent of how many right rows precede
each left row. Skewed keys degrade to a big sort within one task, not
a quadratic blowup; AQE skew handling applies because the exchange is
an ordinary hash partitioning.

The DuckDB oracle replays it with a native ASOF LEFT JOIN
(queries.py::asof_join_events), so the engine's window formulation is
hash-checked against an independent implementation of the semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Attach each ``value_cols`` of the latest right row at or before
    the left row's time, per ``on`` key. Unmatched left rows keep
    nulls. Output: all left columns + ``<value>_asof`` columns +
    ``<right_time><suffix>`` (the matched row's time).

    Right-side times should be unique per key: if several right rows
    share (key, time), which one wins is sort-arbitrary — the same
    ambiguity native ASOF JOIN implementations have. Disambiguate
    upstream (dedupe or compose a unique ordering key) when the right
    side can collide.

    SQL-equality semantics on the key: NULL keys never match (right
    rows with a null key are dropped; left rows with a null key come
    back unmatched), exactly as a native ASOF JOIN's equality
    predicate behaves.

    The matched right row travels as ONE struct through the window
    fill, so a NULL inside a matched row's value column stays NULL —
    it is never backfilled from an older right row (per-column fills
    would stitch together fields of different right rows)."""
    fill_cols = [f"{c}{suffix}" for c in value_cols] + [
        f"{right_time}{suffix}"
    ]
    reserved = {"_t", "_is_left", "_asof_row", *fill_cols}
    clash = reserved & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: left side uses reserved column names "
            f"{sorted(clash)} — rename them or pick another suffix"
        )
    # NULL keys never satisfy SQL equality — drop them from the match
    # pool (left null-key rows form their own window partition with no
    # right rows in it, so they come back unmatched)
    tagged_r = right.filter(F.col(on).isNotNull()).select(
        F.col(on),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        F.struct(
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
            F.col(right_time).alias(f"{right_time}{suffix}"),
        ).alias("_asof_row"),
    )
    left_cols = left.columns
    tagged_l = left.select(
        "*",
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
    )
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    # right rows (_is_left=0) sort before left rows at equal time →
    # inclusive (<=) match, matching ASOF JOIN semantics
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.withColumn(
        "_asof_row", F.last("_asof_row", ignorenulls=True).over(w)
    )
    return filled.filter(F.col("_is_left") == 1).select(
        *left_cols,
        *[F.col(f"_asof_row.{c}").alias(c) for c in fill_cols],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Point-in-interval join without the pair explosion: the naive
    ``p BETWEEN lo AND hi`` inequality join degenerates to a
    broadcast-nested-loop / cartesian product. Here both sides are
    binned to ``bucket_width``-sized buckets — each interval explodes
    to ceil(span/width)+1 bucket rows (pick the width near the typical
    span so that's ~2), each point to exactly one — and the join runs
    as an ordinary HASH equi-join on the bucket id with the BETWEEN
    predicate as a post-filter. A (point, interval) pair can only meet
    in the point's single bucket, so no dedup pass is needed.

    Cost: one hash shuffle each side on the bucket id (or a broadcast
    if the exploded interval side is small), candidate pairs bounded by
    per-bucket density instead of |points| × |intervals|. Buckets are
    plain integer arithmetic → the DuckDB oracle replays the whole
    thing with a native BETWEEN join (queries.py::range_join_events).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            "range_join: overlapping column names on the two sides "
            f"would be ambiguous after the join: {sorted(overlap)}"
        )
    b_pt = F.floor(F.col(point_col) / bucket_width).alias("_bucket")
    p = points.select("*", b_pt)
    iv = intervals.select(
        "*",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width),
                F.floor(F.col(hi_col) / bucket_width),
            )
        ).alias("_bucket"),
    )
    return (
        p.join(iv, "_bucket")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("_bucket")
    )
