"""Adversarial rounding-boundary corpus (round-5 driver-window
insurance): a planted fixture whose values sit ON the hazardous
rounding boundaries — doubles that are the nearest representation of
x.xxxx5 at the checker's 4dp grid, power-of-two length ratios whose ln
folds produce exactly repeated terms, and exact-binary embedding
components — run through the most float-heavy catalog queries with the
SAME Spark-vs-DuckDB compare the driver gate uses. A cross-engine hash
flake (libm ulp × rounding convention × double-rounding) surfaces here
in pytest before a driver draw can catch it.

The compare reuses tools/check_oracles.py's value_hash verbatim, so a
pass here is a pass under the production gate's exact canonicalization.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)
from check_oracles import value_hash  # noqa: E402

# the float-heaviest catalog queries that read only the three planted
# tables — includes every fold the round-4 verdict named in its sweep
BOUNDARY_QUERIES = [
    "hill_tail_index",
    "burstiness_index",
    "theil_sen_trend",
    "sequence_likelihood",
    "acf_periodicity",
    "holt_anomaly",
    "unigram_logprob",
    "label_balance",
    "drift_psi",
    "drift_ks",
    "robust_zscore",
    "ema_hourly",
    "rolling_3sigma",
    "tdigest_quantiles",
    "volume_anomaly",
    "trend_slopes",
    "iqr_outliers",
    "histogram_quantiles",
    "token_entropy",
    "token_pmi",
    "cusum_changepoints",
    "spearman_correlation",
    "quantile_mapping",
    "seasonal_anomaly",
    # round-5 statistical batches (zipf_fit is ln-based; the rest are
    # exact-integer statistics with one quantized float each)
    "benjamini_hochberg",
    "page_hinkley",
    "good_turing",
    "gini_concentration",
    "lead_lag_xcorr",
    "mann_kendall",
    "runs_test",
    "zipf_fit",
    "interarrival_cv",
    "chao1_richness",
    # embeddings-QA batch — the exact-binary grid vectors repeat with
    # period 8, so duplicate_vectors exercises its positive path here
    "dead_dimensions",
    "embedding_quantization_error",
    "duplicate_vectors",
    "label_centroid_separation",
    "anisotropy_audit",
    "seasonality_strength",
    "vocab_overlap_matrix",
    "value_kurtosis",
]

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
]


@pytest.fixture(scope="module")
def boundary_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boundary"))

    # events: values are the nearest doubles of exact 4dp half-points
    # ((k + 0.5) / 1e4) — the precise inputs where a rounding-convention
    # or double-rounding divergence between engines becomes visible —
    # plus integer-valued rows; hourly timestamps over ~42 days so the
    # windowed/seasonal queries have real history
    ev = []
    for i in range(4000):
        et = ["click", "view", "purchase", "scroll"][i % 4]
        k = i % 400
        if i % 7 == 0:
            v = float(k)  # exact integers
        else:
            v = (k + 0.5) / 10_000 + (k % 10)  # 4dp half boundary
        h = i // 4
        ts = f"2026-01-{1 + (h // 96):02d} {h % 24:02d}:{(i * 13) % 60:02d}:00"
        ev.append((i, ts, i % 50, et, v, "{}"))
    spark.createDataFrame(
        ev,
        "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string",
    ).selectExpr(
        "event_id", "CAST(ts_s AS TIMESTAMP) AS ts", "user_id",
        "event_type", "value", "props",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")

    # documents: n_chars on power-of-two ladders (ln ratios become
    # exactly repeated multiples of ln 2 — maximal pressure on the
    # pinned float folds), tiny vocabulary (repeated tf/idf ratios)
    docs = []
    for i in range(300):
        text = " ".join(WORDS[(i + j) % 8] for j in range(3 + i % 9))
        n_chars = 256 << (i % 6) if i % 3 else 300 + 25 * (i % 8)
        docs.append(
            (i, text, ["en", "de"][i % 2],
             ["web", "books", "code"][i % 3], n_chars)
        )
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    # embeddings: exact-binary components — cosines and norms are then
    # bit-identical algebra in both engines, and several land exactly
    # on representable grid values
    emb = []
    grid = [0.5, -0.5, 0.25, -0.25, 1.0, -1.0, 0.0, 0.75]
    for i in range(64):
        vec = [grid[(i + j) % 8] for j in range(8)]
        emb.append((i, vec, i % 4 if i % 5 else 0))
    spark.createDataFrame(
        emb, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    return d


@pytest.fixture(scope="module")
def boundary_con(boundary_dir):
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS"
            f" SELECT * FROM '{boundary_dir}/{t}.parquet/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", BOUNDARY_QUERIES)
def test_boundary_corpus_cross_engine_hash(
    spark, boundary_dir, boundary_con, name
):
    from anomalydetection_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, boundary_dir)
    scols = [f.name.lower() for f in sdf.schema.fields]
    srows = [tuple(r) for r in sdf.collect()]
    res = boundary_con.execute(ORACLES[name])
    dcols = [c[0].lower() for c in res.description]
    drows = res.fetchall()
    assert sorted(scols) == sorted(dcols)
    assert len(srows) == len(drows), f"{len(srows)} vs {len(drows)}"
    h1, h2 = value_hash(srows, scols), value_hash(drows, dcols)
    if h1 != h2:
        idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
        idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
        ss = sorted(
            "|".join(repr(r[i]) for i in idx_s) for r in srows
        )
        dd = sorted(
            "|".join(repr(r[i]) for i in idx_d) for r in drows
        )
        diff = [
            (a, b) for a, b in zip(ss, dd) if a != b
        ][:3]
        pytest.fail(f"value-hash mismatch on boundary corpus: {diff}")
