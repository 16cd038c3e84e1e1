"""Generic one-pass table profiler: per-column stats for arbitrary
schemas (the schema-validation half of the engine's north star, the
batch analog of the reference's per-model feature summaries —
/root/reference/model_manager.py:83-118 computes per-cluster vector
stats; here the unit is a column of any Spark type).

Design for 10^12 rows: ONE aggregation over the table produces every
metric as a map-side-combinable built-in agg (count / min / max / avg /
stddev / approx_count_distinct); the long-form reshape afterwards
operates on a single driver-sized row via ``stack``. No UDFs, no
per-column scans, no shuffle beyond the one partial-agg exchange.

``exact_distinct=True`` swaps HLL approx_count_distinct for exact
count(DISTINCT …) — used by the oracle-gated catalog query so DuckDB
agrees bit-for-bit. NOTE: multi-column exact distinct makes Catalyst
rewrite the agg through an ``Expand`` (one replicated row per distinct
column — 7x the scan rows here), which is exactly the cost HLL
sketches exist to avoid; production profiling at scale keeps the
default HLL path, whose plan is pinned shuffle-minimal
(scan → partial agg → ONE exchange → stack) in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = False,
    distinct_rsd: float = 0.02,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Long-form profile: one row per (column, metric), value double.

    Metrics: every column gets n_rows / n_null / null_rate /
    n_distinct; numeric columns add min / max / avg / stddev (rounded
    to 4 to keep the values engine-portable); strings add
    min/avg/max length; arrays add min/avg/max size. Timestamps/dates
    profile as epoch-second min/max. Unsupported types (struct, map,
    binary) get the null/distinct block only.

    ``group_cols``: profile per group (e.g. ``["partition_id"]`` for
    hot-spot detection) — still one aggregation pass; the output gains
    the group columns and the reshape happens per group row.
    """
    group_cols = group_cols or []
    cols = [
        c for c in (columns or df.columns) if c not in set(group_cols)
    ]
    schema = {f.name: f.dataType for f in df.schema.fields}
    aggs = [F.count(F.lit(1)).alias("__n")]
    per_col: dict[str, list[str]] = {}

    def add(c: str, metric: str, expr) -> None:
        key = f"{c}::{metric}"
        aggs.append(expr.alias(key))
        per_col.setdefault(c, []).append(metric)

    for c in cols:
        dt = schema[c]
        col = F.col(c)
        add(c, "n_null", F.count(F.lit(1)) - F.count(col))
        if exact_distinct:
            add(c, "n_distinct", F.countDistinct(col).cast("double"))
        else:
            add(c, "n_distinct",
                F.approx_count_distinct(col, distinct_rsd).cast("double"))
        if isinstance(dt, _NUMERIC):
            add(c, "min", F.round(F.min(col).cast("double"), 4))
            add(c, "max", F.round(F.max(col).cast("double"), 4))
            add(c, "avg", F.round(F.avg(col), 4))
            add(c, "stddev", F.round(F.stddev_samp(col), 4))
        elif isinstance(dt, T.StringType):
            ln = F.length(col)
            add(c, "min_len", F.min(ln).cast("double"))
            add(c, "max_len", F.max(ln).cast("double"))
            add(c, "avg_len", F.round(F.avg(ln), 4))
        elif isinstance(dt, T.ArrayType):
            sz = F.size(col)
            add(c, "min_size", F.min(sz).cast("double"))
            add(c, "max_size", F.max(sz).cast("double"))
            add(c, "avg_size", F.round(F.avg(sz), 4))
        elif isinstance(
            dt, (T.TimestampType, T.TimestampNTZType, T.DateType)
        ):
            # epoch seconds WITHOUT session-timezone dependence:
            # NTZ -> pure wall-clock diff vs the NTZ epoch literal,
            # DATE -> day arithmetic, instant -> unix_timestamp (which
            # is tz-free for instants). unix_timestamp on NTZ/DATE
            # would shift with spark.sql.session.timeZone.
            if isinstance(dt, T.TimestampNTZType):
                ep = F.expr(
                    "timestampdiff(SECOND,"
                    f" TIMESTAMP_NTZ '1970-01-01 00:00:00', `{c}`)"
                )
            elif isinstance(dt, T.DateType):
                ep = F.datediff(col, F.lit("1970-01-01")) * 86400
            else:
                ep = F.unix_timestamp(col)
            add(c, "min_epoch", F.min(ep).cast("double"))
            add(c, "max_epoch", F.max(ep).cast("double"))
        elif isinstance(dt, T.BooleanType):
            add(c, "true_rate",
                F.round(F.avg(col.cast("double")), 4))

    one = (
        df.groupBy(*group_cols).agg(*aggs) if group_cols else df.agg(*aggs)
    )
    # reshape to long form — stack() on the group-cardinality frame
    pairs = []
    for c in cols:
        for m in per_col[c]:
            pairs.append(f"'{c}', '{m}', cast(`{c}::{m}` as double)")
        pairs.append(f"'{c}', 'null_rate', `{c}::n_null` / nullif(__n, 0)")
        pairs.append(f"'{c}', 'n_rows', cast(__n as double)")
    n_triples = len(pairs)
    return one.selectExpr(
        *[f"`{g}`" for g in group_cols],
        f"stack({n_triples}, {', '.join(pairs)}) as (column, metric, value)",
    ).select(
        *group_cols,
        "column",
        "metric",
        F.round(F.col("value"), 6).alias("value"),
    )


# Metrics that compare as absolute-rate deltas vs relative changes vs
# informational-only (they scale with row count, so cross-snapshot
# comparison is meaningless without normalization — their rate/shape
# counterparts above carry the drift signal).
RATE_METRICS = ("null_rate", "true_rate", "distinct_rate")
INFO_METRICS = ("n_rows", "n_null", "n_distinct")


def profile_drift(
    cur: DataFrame,
    base: DataFrame,
    rate_threshold: float = 0.05,
    rel_threshold: float = 0.5,
) -> DataFrame:
    """Diff two ``profile_table`` snapshots → per-(column, metric)
    drift verdicts: the schema+distribution drift check for ARBITRARY
    tables (the documents pipeline has its own drift stage; this one
    works on any profile pair, e.g. yesterday's orders vs today's).

    Output: (column, metric, base_value, cur_value, delta, rel_change,
    status, verdict).

    * ``status``: 'added' (metric only in cur — new column / type
      change), 'removed' (only in base), else 'compared'. Presence is
      tracked with explicit flags, NOT value nullness — a present
      metric whose value is NULL (e.g. stddev over <2 rows) is still
      'compared' (and passes: no evidence of drift either way).
    * ``verdict``: schema changes (added/removed) always fail;
      RATE_METRICS gate on absolute delta (> rate_threshold);
      INFO_METRICS never fail (row-count-scaled); everything else
      (min/max/avg/stddev/len/size/epoch) gates on relative change
      (> rel_threshold vs |base|; a 0 -> nonzero flip fails).

    Both inputs are profile outputs (driver-bounded: columns x
    metrics rows) — the join is trivially broadcastable; this operator
    adds zero table scans on top of the two profile passes.
    """
    c = cur.select(
        "column", "metric",
        F.col("value").alias("cur_value"),
        F.lit(True).alias("_in_cur"),
    )
    b = base.select(
        "column", "metric",
        F.col("value").alias("base_value"),
        F.lit(True).alias("_in_base"),
    )
    j = c.join(b, ["column", "metric"], "full_outer")
    status = (
        F.when(F.col("_in_base").isNull(), "added")
        .when(F.col("_in_cur").isNull(), "removed")
        .otherwise("compared")
    )
    delta = F.round(F.col("cur_value") - F.col("base_value"), 6)
    abase = F.abs(F.col("base_value"))
    rel = F.when(
        abase > 0,
        F.round((F.col("cur_value") - F.col("base_value")) / abase, 6),
    )
    comparable = F.col("cur_value").isNotNull() & F.col(
        "base_value"
    ).isNotNull()
    verdict = (
        F.when(status != "compared", "fail")
        .when(~comparable, "pass")
        .when(F.col("metric").isin(*INFO_METRICS), "pass")
        .when(
            F.col("metric").isin(*RATE_METRICS),
            F.when(F.abs(delta) > rate_threshold, "fail").otherwise("pass"),
        )
        .when(
            abase == 0,
            F.when(F.abs(F.col("cur_value")) > 0, "fail").otherwise("pass"),
        )
        .when(F.abs(rel) > rel_threshold, "fail")
        .otherwise("pass")
    )
    return j.select(
        "column",
        "metric",
        "base_value",
        "cur_value",
        F.when(comparable, delta).alias("delta"),
        F.when(comparable, rel).alias("rel_change"),
        status.alias("status"),
        verdict.alias("verdict"),
    )
