"""t-digest sketch: rank-error bounds vs exact quantiles, merge
associativity, and the distributed mapInPandas/applyInPandas path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.functions import tdigest as td


def _rank_error(values: np.ndarray, q: float, estimate: float) -> float:
    """|actual rank of estimate - q|."""
    return abs((values <= estimate).mean() - q)


@pytest.mark.parametrize("dist", ["uniform", "lognormal", "bimodal"])
def test_quantile_accuracy(dist):
    rng = np.random.RandomState(11)
    if dist == "uniform":
        v = rng.uniform(0, 1000, 200_000)
    elif dist == "lognormal":
        v = rng.lognormal(3.0, 2.0, 200_000)
    else:
        v = np.concatenate(
            [rng.normal(0, 1, 100_000), rng.normal(100, 5, 100_000)]
        )
    m, w = td.from_values(v)
    assert len(m) < 500  # bounded size
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        est = td.quantile(m, w, [q])[0]
        assert _rank_error(v, q, est) < 0.01, (dist, q)


def test_tail_accuracy_better_than_middle():
    """The arcsine scale function concentrates centroids at the tails."""
    rng = np.random.RandomState(5)
    v = rng.normal(0, 1, 300_000)
    m, w = td.from_values(v)
    tail = _rank_error(v, 0.999, td.quantile(m, w, [0.999])[0])
    assert tail < 0.002


def test_merge_matches_single_build():
    """Split → per-chunk digests → merge ≈ one-shot digest."""
    rng = np.random.RandomState(7)
    v = rng.lognormal(2.0, 1.5, 120_000)
    one_m, one_w = td.from_values(v)
    chunks = np.array_split(v, 7)
    mm, mw = td.merge([td.from_values(c) for c in chunks])
    assert abs(mw.sum() - len(v)) < 1e-6
    for q in (0.05, 0.5, 0.95):
        a = td.quantile(one_m, one_w, [q])[0]
        b = td.quantile(mm, mw, [q])[0]
        assert _rank_error(v, q, b) < 0.01
        assert _rank_error(v, q, a) < 0.01


def test_weight_conservation_and_empty():
    v = np.array([1.0, 2.0, 3.0])
    m, w = td.from_values(v)
    assert w.sum() == 3.0
    m0, w0 = td.from_values(np.array([]))
    assert len(m0) == 0
    assert np.isnan(td.quantile(m0, w0, [0.5])[0])


def test_wasserstein_from_digests_close_to_exact(spark):
    """Digest-based W1 between the event-id halves per event_type is
    within 5% (relative to the value spread) of the exact windowed-CDF
    computation (the drift_wasserstein catalog query)."""
    from anomalydetection_spark.queries import QUERIES

    exact = {
        r.event_type: r.w1
        for r in QUERIES["drift_wasserstein"](
            spark, "/root/testdata/sf0.01"
        ).collect()
    }
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_type", F.col("value").cast("double"), "event_id"
    )
    rows = ev.collect()
    halves: dict[str, tuple[list, list]] = {}
    for r in rows:
        halves.setdefault(r.event_type, ([], []))[r.event_id % 2].append(
            r.value
        )
    for t, (a, b) in halves.items():
        m1, w1 = td.from_values(np.array(a))
        m2, w2 = td.from_values(np.array(b))
        approx = td.wasserstein(m1, w1, m2, w2)
        spread = max(max(a), max(b)) - min(min(a), min(b))
        assert abs(approx - exact[t]) / spread < 0.05, (
            t, approx, exact[t], spread,
        )


def test_wasserstein_identical_and_shifted():
    rng = np.random.RandomState(3)
    v = rng.normal(50, 10, 50_000)
    m, w = td.from_values(v)
    assert td.wasserstein(m, w, m, w) == 0.0
    m2, w2 = td.from_values(v + 7.0)
    approx = td.wasserstein(m, w, m2, w2)
    assert abs(approx - 7.0) < 0.2  # shift distance = shift amount


def test_non_string_group_columns(spark):
    """Group-column dtypes propagate from df.schema into the Arrow output
    schemas (int keys previously failed schema conversion)."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        (F.col("event_id") % 4).cast("int").alias("g"),
        F.col("value").cast("double"),
    )
    out = td.tdigest_quantiles(ev, "value", ["g"], [0.5])
    assert dict(out.dtypes)["g"] == "int"
    rows = out.collect()
    assert sorted(r.g for r in rows) == [0, 1, 2, 3]
    assert all(np.isfinite(r.q0_5) for r in rows)


def test_distributed_quantiles_on_events(spark):
    """mapInPandas partials → applyInPandas merge matches exact
    quantiles per group within 1% rank error."""
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet").select(
        "event_type", F.col("value").cast("double")
    )
    got = {
        r.event_type: (r.q0_5, r.q0_95)
        for r in td.tdigest_quantiles(
            ev, "value", ["event_type"], [0.5, 0.95]
        ).collect()
    }
    import numpy as np

    rows = ev.collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        v = np.array(vals)
        for q, est in zip((0.5, 0.95), got[t]):
            assert abs((v <= est).mean() - q) < 0.01, t
