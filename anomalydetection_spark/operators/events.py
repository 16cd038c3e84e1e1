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

from pyspark.sql import DataFrame, Window
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


def sequence_likelihood(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
    min_transitions: int = 5,
    laplace: float = 1.0,
    baseline: DataFrame | None = None,
) -> DataFrame:
    """Markov transition-likelihood scoring of per-user event
    sequences — the sequence analog of the reference's per-line
    anomaly score (/root/reference/model_manager.py:200-228 scores
    feature vectors; this scores ORDER): fit the global first-order
    transition matrix P(next | prev), then score each user by the
    mean log-likelihood of their observed transitions. Users whose
    event ORDER is improbable under the corpus-wide behavior model
    surface at the bottom even when every individual event type is
    common — bot loops, broken clients, replayed sessions.

    Plan shape at the 10^12-event design point:

    - transitions: ONE window pass (lag over user, ordered by a
      deterministic (ts, tiebreak) key) — the same single hash
      exchange on ``user_col`` the scoring agg needs, so the scoring
      side is one data shuffle;
    - the model is the COMPLETE |types|² grid (distinct types
      cross-joined, left-joined to the map-side-aggregated
      transition counts, Laplace-smoothed): unseen cells carry the
      smoothed floor in the same formula, so scoring is exactly ONE
      broadcast join — no fallback branch, no row-totals pass;
    - fit + score is two passes over the event stream (the standard
      fit/transform shape; in baseline mode each corpus is read
      once) plus one column-pruned distinct scan for the type
      universe. No pass shuffles more than map-side partials except
      the single user exchange;
    - per-user scores are a map-side-combinable avg over the
      already-user-partitioned stream.

    Smoothing uses add-``laplace`` over the |types|² grid so unseen
    transitions get finite log-probability (and the score is defined
    for users whose behavior never occurs in the model). Users with
    fewer than ``min_transitions`` transitions are dropped — a
    2-event user's "sequence" carries no signal.

    ``baseline`` fits the transition model on a DIFFERENT corpus
    (yesterday's events, the known-good window) and scores ``events``
    against it — the fit-on-baseline / score-current shape of every
    other drift rule in this engine. Default fits on ``events``
    itself (self-scoring: within-corpus outliers). Transitions absent
    from the baseline score at the smoothed floor of their prev row
    (laplace / (row_total + laplace·|types|)), including prevs the
    baseline never saw at all (row_total 0).

    Returns (user, n_transitions, avg_log_likelihood) — bounded by
    the user population, not the event count.
    """

    def _transitions(df: DataFrame) -> DataFrame:
        order = [ts_col] + list(order_cols or [])
        w = Window.partitionBy(user_col).orderBy(*order)
        return (
            df.select(user_col, type_col, *order)
            .withColumn("_prev", F.lag(type_col).over(w))
            .filter(F.col("_prev").isNotNull())
            .select(
                user_col,
                F.col("_prev").alias("prev"),
                F.col(type_col).alias("next"),
            )
        )

    fit_on = baseline if baseline is not None else events
    tr = _transitions(events)
    fit_tr = tr if baseline is None else _transitions(baseline)
    # |types| of the MODEL's universe: the smoothing denominator must
    # cover every type the scored stream can present, so take the
    # union when a separate baseline is given
    types_src = (
        fit_on.select(type_col)
        if baseline is None
        else fit_on.select(type_col).unionByName(events.select(type_col))
    )
    # the type universe is bounded metadata (event kinds, not data):
    # collect it once — it feeds both the smoothing constant and the
    # grid, replacing two extra scans of the corpus
    type_vals = sorted(
        r[0] for r in types_src.distinct().collect() if r[0] is not None
    )
    n_types = len(type_vals)
    counts = fit_tr.groupBy("prev", "next").agg(F.count("*").alias("c"))
    # COMPLETE |types|² grid model: unseen cells materialize with c=0
    # so every transition the scored stream can present matches, the
    # smoothed floor falls out of the same formula (c=0, row_total of
    # an unseen prev = 0), and the scoring side needs exactly ONE
    # broadcast join — no separate row-totals pass over the fit
    # stream. All grid algebra is metadata scale (≤|types|² rows).
    from pyspark.sql.types import StructField, StructType

    t_dt = events.schema[type_col].dataType
    grid = events.sparkSession.createDataFrame(
        [(p, n) for p in type_vals for n in type_vals],
        StructType(
            [StructField("prev", t_dt), StructField("next", t_dt)]
        ),
    )
    wp = Window.partitionBy("prev")
    model = (
        grid.join(counts, ["prev", "next"], "left")
        .withColumn("c", F.coalesce("c", F.lit(0)))
        .withColumn(
            "log_p",
            F.log(
                (F.col("c") + F.lit(float(laplace)))
                / (F.sum("c").over(wp) + F.lit(float(laplace) * n_types))
            ),
        )
        .select("prev", "next", "log_p")
    )
    scored = tr.join(F.broadcast(model), ["prev", "next"])
    return (
        scored.groupBy(user_col)
        .agg(
            F.count("*").alias("n_transitions"),
            F.avg("log_p").alias("avg_log_likelihood"),
        )
        .filter(F.col("n_transitions") >= int(min_transitions))
    )
