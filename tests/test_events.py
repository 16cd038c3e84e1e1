"""N-stage funnel operator (operators/events.py) — the generalization
of q_event_funnel's 3-stage plan to arbitrary ordered stage lists."""

from __future__ import annotations

import datetime as dt
import re

import pytest

from anomalydetection_spark.operators.events import funnel


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, 0, s), k) for u, s, k in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_funnel_four_stages_ordered_progression(spark):
    stages = ["land", "signup", "activate", "pay"]
    rows = [
        # u1 completes all four in order
        (1, 0, "land"), (1, 10, "signup"), (1, 20, "activate"), (1, 30, "pay"),
        # u2 pays BEFORE activating: progression stops at signup
        (2, 0, "land"), (2, 10, "signup"), (2, 5, "pay"), (2, 40, "activate"),
        # u3 lands only
        (3, 0, "land"),
        # u4 signs up but never lands: reaches nothing
        (4, 0, "signup"),
        # u5: duplicate stage events — earliest valid hit wins
        (5, 0, "land"), (5, 1, "land"), (5, 2, "signup"), (5, 3, "activate"),
    ]
    out = {
        r["stage_name"]: (r["stage"], r["n_reached"], r["conv_from_prev"])
        for r in funnel(_ev(spark, rows), stages).collect()
    }
    # u2 DOES activate after signup (t=40): land,signup,activate but the
    # pay at t=5 precedes the activate hit -> no stage-4 hit
    assert out["land"] == (1, 4, pytest.approx(4 / 5))
    assert out["signup"] == (2, 3, pytest.approx(3 / 4))
    assert out["activate"] == (3, 3, pytest.approx(1.0))
    assert out["pay"] == (4, 1, pytest.approx(1 / 3))


def test_funnel_matches_legacy_three_stage(spark):
    """funnel(['view','click','purchase']) reproduces the oracle-pinned
    q_event_funnel shape on a small corpus."""
    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        (2, 0, "view"), (2, 1, "click"),
        (3, 0, "view"),
        (4, 0, "click"),  # never viewed
    ]
    got = {
        r["stage_name"]: r["n_reached"]
        for r in funnel(
            _ev(spark, rows), ["view", "click", "purchase"]
        ).collect()
    }
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_empty_stage_yields_null_conversion(spark):
    rows = [(1, 0, "a"), (2, 1, "a")]
    out = {
        r["stage_name"]: (r["n_reached"], r["conv_from_prev"])
        for r in funnel(_ev(spark, rows), ["a", "b", "c"]).collect()
    }
    assert out["a"] == (2, 1.0)
    assert out["b"] == (0, 0.0)
    assert out["c"][0] == 0 and out["c"][1] is None  # 0 / nullif(0) -> NULL


def test_funnel_single_shuffle_plan(spark):
    """The generalized fold keeps the original's cost shape: exactly
    one hash Exchange (the per-user aggregate) before the 1-row
    rollup."""
    rows = [(1, 0, "a"), (1, 1, "b"), (2, 0, "a")]
    plan = (
        funnel(_ev(spark, rows).repartition(4), ["a", "b", "c", "d"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    shuffles = [
        ln
        for ln in plan.splitlines()
        if re.search(r"Exchange hashpartitioning", ln)
    ]
    assert len(shuffles) <= 1


def test_funnel_validates_inputs(spark):
    ev = _ev(spark, [(1, 0, "a")])
    with pytest.raises(ValueError, match="at least 2"):
        funnel(ev, ["a"])
    with pytest.raises(ValueError, match="duplicate"):
        funnel(ev, ["a", "a"])
    with pytest.raises(ValueError, match="quotes"):
        funnel(ev, ["a", "b'; drop"])


def test_sequence_likelihood_bot_ranks_bottom(spark):
    """20 users alternate view/click; one bot loops view->view.
    Every individual event type is common — only the ORDER is odd."""
    from anomalydetection_spark.operators.events import sequence_likelihood

    rows = []
    for u in range(1, 21):
        for s in range(10):
            rows.append((u, s, "view" if s % 2 == 0 else "click"))
    rows += [(99, s, "view") for s in range(10)]
    out = sequence_likelihood(_ev(spark, rows), min_transitions=5).collect()
    assert len(out) == 21
    worst = min(out, key=lambda r: r.avg_log_likelihood)
    assert worst.user_id == 99
    # normal users all share one score; the bot is strictly below it
    normal = {round(r.avg_log_likelihood, 9) for r in out if r.user_id != 99}
    assert len(normal) == 1
    assert worst.avg_log_likelihood < min(normal) - 0.5


def test_sequence_likelihood_min_transitions_and_pin(spark):
    """Hand-computed Laplace algebra on a 2-type corpus; short users
    are dropped."""
    import math

    from anomalydetection_spark.operators.events import sequence_likelihood

    # u1: a->b->a->b->a->b (5 transitions); u2: a->b only (1: dropped)
    rows = [(1, s, "a" if s % 2 == 0 else "b") for s in range(6)]
    rows += [(2, 0, "a"), (2, 1, "b")]
    out = sequence_likelihood(
        _ev(spark, rows), min_transitions=5
    ).collect()
    assert [r.user_id for r in out] == [1]
    # counts: a->b = 4 (3 from u1... u1 transitions: ab,ba,ab,ba,ab = 3
    # a->b + 2 b->a) + 1 from u2 -> a->b 4, b->a 2; |types|=2, laplace 1
    p_ab = (4 + 1) / (4 + 2)   # row a total 4
    p_ba = (2 + 1) / (2 + 2)   # row b total 2
    exp = (3 * math.log(p_ab) + 2 * math.log(p_ba)) / 5
    assert abs(out[0].avg_log_likelihood - exp) < 1e-9


def test_sequence_likelihood_baseline_floor(spark):
    """Fit on a baseline, score a stream with transitions (and a type)
    the baseline never saw: both floor cases are finite and exact."""
    import math

    from anomalydetection_spark.operators.events import sequence_likelihood

    base = [(u, s, "a" if s % 2 == 0 else "b") for u in (1, 2)
            for s in range(6)]
    # current: u7 does a->a (unseen transition, seen prev);
    # u8 loops c->c (type absent from baseline entirely)
    cur = [(7, s, "a") for s in range(6)] + [(8, s, "c") for s in range(6)]
    out = {
        r.user_id: r.avg_log_likelihood
        for r in sequence_likelihood(
            _ev(spark, cur), baseline=_ev(spark, base), min_transitions=5
        ).collect()
    }
    # union universe: {a, b, c} -> |types| = 3. Baseline rows:
    # a->b 6, b->a 4 (per user: 3 ab + 2 ba, two users)
    floor_a = 1.0 / (6 + 3)        # prev 'a' total 6, laplace 1
    floor_c = 1.0 / (0 + 3)        # prev 'c' never seen
    assert abs(out[7] - math.log(floor_a)) < 1e-9
    assert abs(out[8] - math.log(floor_c)) < 1e-9
