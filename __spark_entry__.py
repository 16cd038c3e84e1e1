"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship validation pass over the sf0.001 tables:
constraint checks (uniqueness, referential, type-conformance,
threshold) + drift (PSI) unioned into one verdicts DataFrame.

``queries()`` / ``oracle_sql()`` — the operator catalog from
``anomalydetection_spark.queries`` (one entry per SURVEY.md §2 operator
family — see SURVEY.md §8 for the full operator → query map). As of
round 5 the only oracle-less entry is the Drain template miner
(genuinely order-dependent incremental clustering); the formerly
rows-only seeded trio carries property oracles — ann_ivf hash-checks
its exact-tier top-k values + a recall boolean, iforest_scores proves
itself on planted outliers, similarity_groups emits greedy-contract
invariants DuckDB recomputes. The EMA fold is oracle'd via DuckDB
list_reduce; HLL/t-digest sketches via in-query tolerance-band
booleans both engines agree on.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from anomalydetection_spark.queries import ORACLES, QUERIES  # noqa: E402

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: multi-check validation verdicts over sf0.001."""
    ev = spark.read.parquet(f"{SF0001}/events.parquet")
    li = spark.read.parquet(f"{SF0001}/lineitem.parquet")
    cust = spark.read.parquet(f"{SF0001}/customer.parquet")

    from anomalydetection_spark.operators.uniqueness import duplicate_keys

    uniq = duplicate_keys(li, "l_orderkey").agg(
        F.count("*").alias("n_violations")
    ).select(
        F.lit("uniqueness_l_orderkey").alias("check"),
        F.col("n_violations").cast("long"),
        F.when(F.col("n_violations") > 0, "fail").otherwise("pass").alias("verdict"),
    )

    catalog = cust.select(F.col("c_custkey").cast("long").alias("user_id"))
    ref = ev.join(catalog, "user_id", "left_anti").agg(
        F.count("*").alias("n_violations")
    ).select(
        F.lit("referential_user_id").alias("check"),
        F.col("n_violations").cast("long"),
        F.when(F.col("n_violations") > 0, "fail").otherwise("pass").alias("verdict"),
    )

    conf = ev.agg(
        F.sum(
            F.when(~F.col("props").rlike('^\\{"k": [0-9]+\\}$'), 1).otherwise(0)
        ).alias("n_violations")
    ).select(
        F.lit("type_conformance_props").alias("check"),
        F.col("n_violations").cast("long"),
        F.when(F.col("n_violations") > 0, "fail").otherwise("pass").alias("verdict"),
    )

    thresh = ev.agg(
        F.sum(F.when(F.col("value") < 0.5, 1).otherwise(0)).alias("n_violations")
    ).select(
        F.lit("threshold_value").alias("check"),
        F.col("n_violations").cast("long"),
        F.when(F.col("n_violations") > 0, "fail").otherwise("pass").alias("verdict"),
    )

    return uniq.unionByName(ref).unionByName(conf).unionByName(thresh)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
