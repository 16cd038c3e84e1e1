"""Event-sequence analytics: the N-stage ordered conversion funnel.

Generalizes the view→click→purchase funnel (queries.py::q_event_funnel,
reference analog /root/reference/log_parser.py:84-142's per-cluster
sequence stats) to an arbitrary ordered stage list.

Plan shape — identical to the 3-stage original and the reason it
survives a 100× scale-up: ONE shuffle (groupBy user) collects each
stage's sorted timestamp array; stage progression is then a row-local
``aggregate()`` higher-order fold over the array-of-stage-arrays — the
stage-k hit is the minimum stage-k timestamp strictly AFTER the
stage-(k−1) hit, NULL propagating once a stage is missed (a comparison
against a NULL previous hit filters out every candidate). No
self-joins, no global window; per-user event counts are bounded, so
the fold is O(events/user) per row and the whole funnel is a single
hash aggregate plus a 1-row final rollup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """(stage, stage_name, n_reached, conv_from_prev) — one row per
    stage of the ordered funnel, ANSI-safe (empty stages yield NULL
    conversion, never a crash)."""
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError(f"duplicate stage names in {stages!r}")
    if any("'" in s or "\\" in s for s in stages):
        raise ValueError("stage names must not contain quotes/backslashes")

    per_user = events.groupBy(user_col).agg(
        *[
            F.sort_array(
                F.collect_list(
                    F.when(F.col(type_col) == s, F.col(ts_col))
                )
            ).alias(f"_s{i}")
            for i, s in enumerate(stages)
        ]
    )
    # row-local fold: hits[k] = min ts of stage k strictly after
    # hits[k-1]; first stage takes its minimum (head of the sorted
    # array). try_element_at keeps empty arrays / missed stages NULL
    # under ANSI.
    ts_type = events.schema[ts_col].dataType.simpleString()
    hits = F.aggregate(
        F.array(*[F.col(f"_s{i}") for i in range(len(stages))]),
        F.expr(f"CAST(array() AS array<{ts_type}>)"),
        lambda acc, arr: F.concat(
            acc,
            F.array(
                F.when(
                    F.size(acc) == 0, F.try_element_at(arr, F.lit(1))
                ).otherwise(
                    F.array_min(
                        F.filter(
                            arr,
                            lambda x: x > F.try_element_at(acc, F.lit(-1)),
                        )
                    )
                )
            ),
        ),
    )
    staged = per_user.select(hits.alias("hits"))
    tot = staged.agg(
        F.count("*").alias("n0"),
        *[
            F.count(F.try_element_at("hits", F.lit(i + 1))).alias(f"n{i + 1}")
            for i in range(len(stages))
        ],
    )
    stack_rows = ",\n".join(
        f"{i + 1}, '{s}', n{i + 1}, round(n{i + 1} / nullif(n{i}, 0), 6)"
        for i, s in enumerate(stages)
    )
    return tot.selectExpr(
        f"stack({len(stages)}, {stack_rows}) "
        "AS (stage, stage_name, n_reached, conv_from_prev)"
    ).selectExpr(
        "CAST(stage AS INT) AS stage",
        "stage_name",
        "CAST(n_reached AS BIGINT) AS n_reached",
        "CAST(conv_from_prev AS DOUBLE) AS conv_from_prev",
    )
