"""t-digest quantile sketch: numpy build/merge + Arrow-batched Spark
integration.

The north-star column-stats profiler computes distribution quantiles
per (partition, span kind) without a global sort: each partition emits
a bounded t-digest partial (mergeable, ~O(δ) centroids), partials merge
associatively up the tree, and any quantile interpolates from the final
digest. ``percentile_approx`` (Spark's built-in sketch) remains the
zero-dependency fallback used by operators/stats.py; this module is the
explicit t-digest path with controllable compression and mergeability
across snapshots (you can persist digests in the manifest and merge
across runs — percentile_approx state is not exposed).

Implementation: the *merging* t-digest (Dunning's MergingDigest): sort
incoming values/centroids, sweep once, greedily merge neighbors while
the running quantile-width bound k(q_r) - k(q_l) <= 1 holds, with the
arcsine scale function k(q) = δ/(2π)·asin(2q-1) that concentrates
resolution at the tails. Pure numpy — vectorized, no per-row Python.
"""

from __future__ import annotations

import math
from typing import Iterable

import numpy as np

DEFAULT_COMPRESSION = 200.0


def _k(q: np.ndarray, delta: float) -> np.ndarray:
    """Arcsine scale function (tail-biased resolution)."""
    return delta / (2.0 * math.pi) * np.arcsin(2.0 * np.clip(q, 0.0, 1.0) - 1.0)


def compress(
    means: np.ndarray, weights: np.ndarray, delta: float = DEFAULT_COMPRESSION
) -> tuple[np.ndarray, np.ndarray]:
    """One vectorized merge pass over sorted centroids → compressed digest.

    Fully vectorized (no per-value Python): sort, cumulative weight →
    each centroid's right-edge quantile → integer cell of the scale
    function ``floor(k(q_r))`` → consecutive equal-cell runs merge via
    ``np.add.reduceat``. Every merged cluster lies inside one unit cell
    of k plus at most the preceding boundary straddle, so cluster
    k-width stays O(1) and the standard t-digest accuracy bound holds
    (rank error pinned <1% by tests/test_tdigest.py across uniform /
    lognormal / bimodal).
    """
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="stable")
    means = means[order].astype(np.float64)
    weights = weights[order].astype(np.float64)
    total = weights.sum()

    q_r = np.cumsum(weights) / total
    cells = np.floor(_k(q_r, delta))
    starts = np.flatnonzero(np.r_[True, cells[1:] != cells[:-1]])
    out_weights = np.add.reduceat(weights, starts)
    out_means = np.add.reduceat(means * weights, starts) / out_weights
    return out_means, out_weights


def from_values(
    values: np.ndarray, delta: float = DEFAULT_COMPRESSION
) -> tuple[np.ndarray, np.ndarray]:
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    return compress(v, np.ones_like(v), delta)


def merge(
    digests: Iterable[tuple[np.ndarray, np.ndarray]],
    delta: float = DEFAULT_COMPRESSION,
) -> tuple[np.ndarray, np.ndarray]:
    """Associative merge: concat centroids, one compress pass."""
    ms, ws = [], []
    for m, w in digests:
        ms.append(np.asarray(m, dtype=np.float64))
        ws.append(np.asarray(w, dtype=np.float64))
    if not ms:
        return np.array([]), np.array([])
    return compress(np.concatenate(ms), np.concatenate(ws), delta)


def quantile(
    means: np.ndarray, weights: np.ndarray, qs: Iterable[float]
) -> list[float]:
    """Interpolated quantiles from a digest (centroid midpoints)."""
    means = np.asarray(means, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    out = []
    if len(means) == 0:
        return [float("nan") for _ in qs]
    total = weights.sum()
    # cumulative weight at each centroid's midpoint
    cum = np.cumsum(weights) - weights / 2.0
    for q in qs:
        target = q * total
        if target <= cum[0]:
            out.append(float(means[0]))
        elif target >= cum[-1]:
            out.append(float(means[-1]))
        else:
            i = int(np.searchsorted(cum, target))
            lo, hi = cum[i - 1], cum[i]
            frac = 0.0 if hi == lo else (target - lo) / (hi - lo)
            val = means[i - 1] + frac * (means[i] - means[i - 1])
            # fp rounding can overshoot the bracketing centroid (e.g.
            # denormal-range means: -1.4e-45 + frac*1.4e-45 rounds to
            # exactly 0.0 > means[i]); clamp into [means[i-1], means[i]]
            # which also keeps the q->value map monotone
            out.append(float(min(max(val, means[i - 1]), means[i])))
    return out


def wasserstein(
    means1: np.ndarray,
    weights1: np.ndarray,
    means2: np.ndarray,
    weights2: np.ndarray,
) -> float:
    """1-Wasserstein (earth-mover) distance between two digests:
    ∫|CDF₁ − CDF₂| dx over the union of centroid positions (each digest
    treated as point masses at its centroid means). Error is bounded by
    centroid widths, i.e. O(1/δ) of the value range — good enough for a
    drift score, and computable from the SAME mergeable partials the
    quantile path already produces (no second data pass)."""
    m1 = np.asarray(means1, dtype=np.float64)
    m2 = np.asarray(means2, dtype=np.float64)
    w1 = np.asarray(weights1, dtype=np.float64)
    w2 = np.asarray(weights2, dtype=np.float64)
    if len(m1) == 0 or len(m2) == 0:
        return float("nan")
    xs = np.unique(np.concatenate([m1, m2]))
    cdf1 = np.cumsum(w1[np.argsort(m1, kind="stable")])
    cdf2 = np.cumsum(w2[np.argsort(m2, kind="stable")])
    c1 = cdf1[np.searchsorted(np.sort(m1), xs, side="right") - 1]
    c1 = np.where(np.searchsorted(np.sort(m1), xs, side="right") == 0, 0.0, c1)
    c2 = cdf2[np.searchsorted(np.sort(m2), xs, side="right") - 1]
    c2 = np.where(np.searchsorted(np.sort(m2), xs, side="right") == 0, 0.0, c2)
    c1 = c1 / w1.sum()
    c2 = c2 / w2.sum()
    return float(np.sum(np.abs(c1[:-1] - c2[:-1]) * np.diff(xs)))


# ---------------------------------------------------------------------------
# Spark integration (Arrow-batched; digests travel as array<double> pairs)
# ---------------------------------------------------------------------------

def tdigest_partials(df, value_col: str, group_cols: list[str],
                     delta: float = DEFAULT_COMPRESSION):
    """Per-(group, physical-partition) digest partials via mapInPandas:
    one streaming pass, bounded memory, no shuffle of raw values. The
    output is small (≤ groups × partitions rows) and merge-ready."""
    import pandas as pd
    from pyspark.sql import functions as F

    cols = [*group_cols, value_col]

    def build(batches):
        acc: dict[tuple, tuple[np.ndarray, np.ndarray]] = {}
        for pdf in batches:
            for key, sub in pdf.groupby(group_cols, dropna=False, sort=False):
                key = key if isinstance(key, tuple) else (key,)
                d = from_values(sub[value_col].to_numpy(), delta)
                prev = acc.get(key)
                acc[key] = merge([prev, d], delta) if prev else d
        rows = []
        for key, (m, w) in acc.items():
            rows.append(
                {
                    **dict(zip(group_cols, key)),
                    "centroid_means": m.tolist(),
                    "centroid_weights": w.tolist(),
                }
            )
        if rows:
            yield pd.DataFrame(rows)

    schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    ) + ", centroid_means array<double>, centroid_weights array<double>"
    return df.select(*cols).mapInPandas(build, schema=schema)


def tdigest_quantiles(df, value_col: str, group_cols: list[str],
                      qs: list[float],
                      delta: float = DEFAULT_COMPRESSION):
    """Distributed quantiles: partials → grouped merge (applyInPandas)
    → interpolated quantiles per group."""
    import pandas as pd

    partials = tdigest_partials(df, value_col, group_cols, delta)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = merge(
            zip(
                (np.asarray(x) for x in pdf["centroid_means"]),
                (np.asarray(x) for x in pdf["centroid_weights"]),
            ),
            delta,
        )
        vals = quantile(m, w, qs)
        row = {c: pdf[c].iloc[0] for c in group_cols}
        for q, v in zip(qs, vals):
            row[f"q{str(q).replace('.', '_')}"] = v
        return pd.DataFrame([row])

    out_schema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    ) + ", " + ", ".join(
        f"q{str(q).replace('.', '_')} double" for q in qs
    )
    return partials.groupBy(*group_cols).applyInPandas(
        merge_group, schema=out_schema
    )
