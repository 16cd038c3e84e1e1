"""IsolationForest parity tier (operators/iforest.py).

Mirrors /root/reference/model_manager.py:90-92,200-224: per-corpus
IsolationForest(contamination=0.1) over TF-IDF features, anomaly iff
decision score < drain3.ini's −0.04. The pure-numpy reimplementation
is checked three ways: algebraic constants, separation on planted
outliers, driver↔distributed bit-identity — and the headline parity
test shows planted log anomalies rank identically to the drift
re-expression's verdicts (operators/drift.py, the north-rule-blessed
A2 re-expression) on the same fixture corpus.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from anomalydetection_spark.operators.iforest import (
    average_path_length,
    fit_iforest,
    iforest_scores,
)

_GAMMA = 0.5772156649015329


def test_average_path_length_constants():
    out = average_path_length([0, 1, 2, 3, 256])
    assert out[0] == 0.0 and out[1] == 0.0
    assert out[2] == 1.0
    assert out[3] == pytest.approx(2 * (math.log(2) + _GAMMA) - 4.0 / 3.0)
    assert out[4] == pytest.approx(
        2 * (math.log(255) + _GAMMA) - 2 * 255.0 / 256.0
    )


def _planted_matrix(seed=0, n_in=300, n_out=8, d=6):
    rng = np.random.default_rng(seed)
    inliers = rng.normal(0.0, 1.0, size=(n_in, d))
    outliers = rng.normal(0.0, 1.0, size=(n_out, d)) + 8.0
    return np.vstack([inliers, outliers]), n_in


def test_fit_separates_planted_outliers():
    X, n_in = _planted_matrix()
    f = fit_iforest(X, n_trees=100, max_samples=128, seed=3)
    s = f.score_samples(X)
    # the planted cluster occupies exactly the lowest n_out ranks
    assert set(np.argsort(s)[: len(X) - n_in]) == set(range(n_in, len(X)))
    # sklearn conventions: score_samples in [-1, 0); offset_ at the
    # contamination quantile of training scores -> ~10% of training
    # rows have decision_function <= 0
    assert (s < 0).all() and (s >= -1).all()
    dec = f.decision_function(X)
    frac = (dec <= 0).mean()
    assert 0.05 <= frac <= 0.2
    # planted rows are decisively below the reference's -0.04 gate
    assert (dec[n_in:] < -0.04).all()


def test_fit_deterministic_given_seed():
    X, _ = _planted_matrix(seed=5)
    a = fit_iforest(X, n_trees=20, max_samples=64, seed=11)
    b = fit_iforest(X, n_trees=20, max_samples=64, seed=11)
    assert np.array_equal(a.feature, b.feature)
    assert np.array_equal(a.threshold, b.threshold)
    assert a.offset_ == b.offset_
    c = fit_iforest(X, n_trees=20, max_samples=64, seed=12)
    assert not np.array_equal(a.threshold, c.threshold)


def test_distributed_scoring_matches_driver(spark):
    """mapInPandas scoring is bit-identical to the driver-side
    decision_function on the same broadcast model (sample covers the
    whole table, so both paths score with one forest)."""
    X, n_in = _planted_matrix(seed=1, n_in=120, n_out=5)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)
    out = iforest_scores(
        df, "vec_id", "embedding", n_trees=40, max_samples=64,
        sample=10_000, seed=2,
    )
    got = {r["vec_id"]: (r["score"], r["is_anomaly"]) for r in out.collect()}
    assert len(got) == len(X)

    # rebuild the same model at the driver: identical md5-ordered
    # sample (covers everything), same seed
    import hashlib

    order = sorted(
        range(len(X)),
        key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i),
    )
    f = fit_iforest(X[order], n_trees=40, max_samples=64, seed=2)
    dec = f.decision_function(X)
    for i in range(len(X)):
        assert got[i][0] == pytest.approx(dec[i], abs=1e-12)
        assert got[i][1] == bool(dec[i] < -0.04)
    # planted anomalies flagged, inliers' flag rate stays near
    # contamination
    assert all(got[i][1] for i in range(n_in, len(X)))


def _hashed_tf(texts: list[str], dims: int = 32) -> np.ndarray:
    """Deterministic hashed term-frequency featurizer — the TF-IDF
    stand-in for model_manager.py:171-176's TfidfVectorizer (idf is a
    per-column scale; isolation splits are scale-covariant per column,
    so TF suffices for rank parity)."""
    import hashlib

    M = np.zeros((len(texts), dims))
    for i, t in enumerate(texts):
        for tok in t.lower().split():
            j = int(hashlib.md5(tok.encode()).hexdigest(), 16) % dims
            M[i, j] += 1.0
    return M


def test_parity_with_drift_reexpression(spark):
    """The headline A2 parity check: on a fixture log corpus with
    planted rare-template anomalies, the iForest tier
    (reference-faithful: TF features -> forest -> score < threshold)
    flags EXACTLY the same documents as the drift re-expression
    (per-template PSI vs the pre-incident baseline), and the planted
    docs occupy exactly the lowest score ranks."""
    from anomalydetection_spark.operators.drift import drift_verdicts

    templates = [
        "request id <*> served in <*> ms",
        "user <*> logged in from <*>",
        "cache miss for key <*>",
        "heartbeat ok shard <*>",
        "flushed <*> rows to segment <*>",
    ]
    n_normal, n_planted = 490, 10
    texts = [templates[i % 5] for i in range(n_normal)] + [
        f"FATAL disk corruption unrecoverable sector{i} panic halt"
        for i in range(n_planted)
    ]
    tmpl = [f"t{i % 5}" for i in range(n_normal)] + [
        f"fatal{i}" for i in range(n_planted)
    ]

    # --- iForest tier ---
    X = _hashed_tf(texts)
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(texts))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    scored = iforest_scores(
        df, "vec_id", "embedding", n_trees=100, max_samples=128, seed=4
    ).toPandas().sort_values("score")
    planted = set(range(n_normal, n_normal + n_planted))
    assert set(scored["vec_id"].head(n_planted)) == planted
    iforest_flagged = set(scored[scored["is_anomaly"]]["vec_id"])
    assert iforest_flagged == planted

    # --- drift re-expression on the same corpus ---
    # per-template-histogram PSI explanation vs the pre-incident
    # baseline: the planted templates are exactly the buckets that are
    # NEW (p_base = 0, p_cur > 0) — the drift-side verdict for "novel
    # log classes appeared", which is what the reference's per-log
    # model flags (model_manager.py:200-224)
    from anomalydetection_spark.operators.drift import psi_explain

    cur = spark.createDataFrame(
        pd.DataFrame({"bucket": tmpl}).value_counts().reset_index(name="count")
    )
    base = spark.createDataFrame(
        pd.DataFrame({"bucket": tmpl[:n_normal]})
        .value_counts()
        .reset_index(name="count")
    )
    cur = cur.selectExpr("'corpus' as scope", "bucket", "count")
    base = base.selectExpr("'corpus' as scope", "bucket", "count")
    contrib = psi_explain(
        cur, base, keys=["scope"], k=len(set(tmpl))
    ).collect()
    overall = drift_verdicts(
        cur, base, keys=["scope"], psi_threshold=0.01, ks_threshold=2.0
    ).filter("check like 'drift_psi%'").collect()
    assert overall[0]["verdict"] == "fail"  # the corpus as a whole drifted
    novel_templates = {
        r["bucket"] for r in contrib if r["p_base"] == 0.0 and r["p_cur"] > 0
    }
    drift_flagged = {i for i, t in enumerate(tmpl) if t in novel_templates}
    assert drift_flagged == planted == iforest_flagged
