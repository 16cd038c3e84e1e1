"""Count-min sketch as a declarative, mergeable DataFrame relation —
no UDF, no driver state.

The sketch IS a (depth x width) count table materialized as rows
``(d, b, c)``: row ``d`` of the sketch, bucket ``b = h_d(v) % width``,
``c`` = number of input rows hashing there. Properties that matter at
scale all fall out of the representation:

- building it is ONE map-side-combinable groupBy (depth x width
  result rows, independent of input size);
- two sketches over disjoint data merge by unioning the relations and
  summing ``c`` per (d, b) — the same shape the incremental profiler
  uses for its moment partials, so per-partition sketches can be
  persisted and folded without rescanning;
- point-frequency queries join the (tiny, broadcast) sketch to the
  probe keys' buckets and take min over d: estimate >= true count
  always, overestimate bounded by collisions (eps ~ e/width per the
  standard CM guarantee).

Hashes are the repo's cross-engine md5 scheme (md5 hex -> first 8
nibbles -> BIGINT), so a DuckDB oracle reproduces the sketch — and
therefore the ESTIMATES — bit-exactly; the sketch is an auditable
deterministic artifact, not an approximation black box.

Re-expresses the reference's per-template frequency bookkeeping
(persistence.py keeps exact per-cluster counts in SQLite — viable at
10^3 templates, not at 10^9 distinct keys) as the sketch any 100 TB
frequency surface needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(value_sql: str, width: int) -> str:
    return (
        f"cast(conv(substring(md5(concat(cast(d as string), ':', "
        f"{value_sql})), 1, 8), 16, 10) as bigint) % {width}"
    )


def cms_build(
    df: DataFrame, col: str, width: int = 256, depth: int = 4
) -> DataFrame:
    """Sketch relation ``(d, b, c)`` for the (non-null) values of
    ``col``. depth*width result rows; one shuffle."""
    rows = (
        df.filter(F.col(col).isNotNull())
        .select(F.col(col).cast("string").alias("v"))
        .select(
            F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("d"), "v"
        )
        .select("d", F.expr(_bucket_expr("v", width)).alias("b"))
    )
    return rows.groupBy("d", "b").agg(F.count("*").alias("c"))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with the same (width, depth): union + sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for each key: min over the depth rows
    of the key's bucket counts (absent bucket = 0). The sketch side is
    depth*width rows — broadcast it; the probe fans each key out to
    ``depth`` lookups."""
    kb = keys.select(
        F.col(key_col).alias("key"),
        F.explode(F.expr(f"sequence(0, {depth - 1})")).alias("d"),
    ).select(
        "key",
        "d",
        F.expr(
            _bucket_expr(f"cast(key as string)", width)
        ).alias("b"),
    )
    return (
        kb.join(F.broadcast(sketch), ["d", "b"], "left")
        .fillna(0, ["c"])
        .groupBy("key")
        .agg(F.min("c").alias("cms_estimate"))
    )
