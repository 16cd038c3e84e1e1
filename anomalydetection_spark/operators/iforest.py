"""Pure-numpy IsolationForest — the parity tier for the reference's
per-log anomaly models.

Reference behavior mirrored here:
- ``/root/reference/model_manager.py:90-92``: each log gets
  ``IsolationForest(contamination=0.1)`` fit on a TF-IDF feature
  matrix of its parsed templates.
- ``/root/reference/model_manager.py:200-224``: scoring uses
  ``decision_function``; a row is an anomaly iff its score is below
  ``ANOMALIES_THRESHOLD`` (``drain3.ini:107-112``: −0.04 for
  individual models, 0.00 for the ensemble).

sklearn is absent from this container, so fit/score are reimplemented
from the published algorithm (Liu, Ting & Zhou, "Isolation Forest",
ICDM 2008) with sklearn's score conventions so the thresholds from
``drain3.ini`` transfer unchanged:

- ``score_samples(x) = −2^(−E[h(x)] / c(ψ))`` ∈ [−1, 0) — lower is
  more anomalous;
- ``decision_function(x) = score_samples(x) − offset`` where
  ``offset`` is the ``contamination`` quantile of the TRAINING
  sample's ``score_samples`` (sklearn's fit-time offset_);
- ``predict(x) = −1`` iff ``decision_function(x) < threshold``.

Tree build follows sklearn's ExtraTree(splitter='random',
max_features=1) shape: at each node pick a random non-constant
feature, split uniformly in its (min, max), stop at depth
``ceil(log2(ψ))`` / singleton / all-constant nodes; an external node
of size n contributes ``depth + c(n)`` to the path length, with
``c(n) = 2·H(n−1) − 2(n−1)/n`` the BST average-path correction.

Spark shape — the same sample-train / broadcast-score split ann.py
uses for IVF (operators/ann.py:189-207): the forest is fit on a
bounded deterministic sample collected at the driver (training cost
is O(sample·trees·log ψ) regardless of corpus size — ψ=256 subsamples
per tree is the paper's recommendation and sklearn's default), the
compact tree arrays (a few KB) are broadcast, and every row is scored
by an Arrow-batched ``mapInPandas`` whose tree traversal is fully
vectorized: a batch descends all trees level-by-level, ≤ ceil(log2 ψ)
(+1 leaf step) numpy selects per tree. Scoring is a pure map — no
shuffle, no per-row Python — so the plan scales to any corpus size.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EULER_GAMMA = 0.5772156649015329


def average_path_length(n) -> np.ndarray:
    """c(n): expected unsuccessful-search path length in a BST of n
    nodes (iForest paper eq. 1, sklearn's _average_path_length):
    0 for n ≤ 1, 1 for n = 2, else 2·H(n−1) − 2(n−1)/n."""
    n = np.asarray(n, dtype=np.float64)
    out = np.zeros_like(n)
    out[n == 2] = 1.0
    big = n > 2
    nb = n[big]
    out[big] = 2.0 * (np.log(nb - 1.0) + _EULER_GAMMA) - 2.0 * (nb - 1.0) / nb
    return out


class IForest:
    """Compact array-of-nodes forest. Per node: feature (−1 = leaf),
    threshold, left/right child index (tree-local), leaf size. Trees
    are concatenated with an offsets array so the whole model
    broadcasts as five numpy arrays + two scalars."""

    __slots__ = (
        "feature", "threshold", "left", "right", "n_node_samples",
        "tree_offsets", "max_samples", "offset_",
    )

    def __init__(self, feature, threshold, left, right, n_node_samples,
                 tree_offsets, max_samples, offset_=0.0):
        self.feature = feature
        self.threshold = threshold
        self.left = left
        self.right = right
        self.n_node_samples = n_node_samples
        self.tree_offsets = tree_offsets
        self.max_samples = max_samples
        self.offset_ = offset_

    # -- scoring ---------------------------------------------------------
    def path_lengths(self, X: np.ndarray) -> np.ndarray:
        """Mean isolation depth E[h(x)] over all trees, vectorized:
        every row walks every tree one level per numpy step."""
        n = X.shape[0]
        depths = np.zeros(n, dtype=np.float64)
        n_trees = len(self.tree_offsets) - 1
        for t in range(n_trees):
            base = self.tree_offsets[t]
            node = np.full(n, base, dtype=np.int64)
            depth = np.zeros(n, dtype=np.float64)
            active = self.feature[node] >= 0
            while active.any():
                idx = node[active]
                f = self.feature[idx]
                go_left = X[active, f] <= self.threshold[idx]
                node[active] = base + np.where(
                    go_left, self.left[idx], self.right[idx]
                )
                depth[active] += 1.0
                active = self.feature[node] >= 0
            depths += depth + average_path_length(self.n_node_samples[node])
        return depths / n_trees

    def score_samples(self, X: np.ndarray) -> np.ndarray:
        c = average_path_length(np.array([self.max_samples]))[0]
        return -np.power(2.0, -self.path_lengths(X) / max(c, 1e-12))

    def decision_function(self, X: np.ndarray) -> np.ndarray:
        return self.score_samples(X) - self.offset_


def fit_iforest(
    X: np.ndarray,
    n_trees: int = 100,
    max_samples: int = 256,
    contamination: float = 0.1,
    seed: int = 0,
) -> IForest:
    """Fit on a driver-side feature matrix (rows = the bounded
    training sample). Deterministic given (X row order, seed)."""
    X = np.asarray(X, dtype=np.float64)
    n, _d = X.shape
    psi = min(max_samples, n)
    depth_limit = max(1, math.ceil(math.log2(max(psi, 2))))
    rng = np.random.default_rng(seed)

    feature, threshold, left, right, nsize = [], [], [], [], []
    offsets = [0]
    for _t in range(n_trees):
        sample = rng.choice(n, size=psi, replace=False)
        base = len(feature)
        # stack of (row-index array, depth, node slot); children are
        # appended then back-patched into the parent slot
        slot = len(feature)
        feature.append(-1); threshold.append(0.0)
        left.append(-1); right.append(-1); nsize.append(len(sample))
        stack = [(sample, 0, slot)]
        while stack:
            rows, depth, slot = stack.pop()
            nsize[slot] = len(rows)
            if depth >= depth_limit or len(rows) <= 1:
                continue
            sub = X[rows]
            lo, hi = sub.min(axis=0), sub.max(axis=0)
            varying = np.flatnonzero(hi > lo)
            if varying.size == 0:
                continue
            f = int(rng.choice(varying))
            t = float(rng.uniform(lo[f], hi[f]))
            mask = sub[:, f] <= t
            lslot = len(feature)
            feature.append(-1); threshold.append(0.0)
            left.append(-1); right.append(-1); nsize.append(0)
            rslot = len(feature)
            feature.append(-1); threshold.append(0.0)
            left.append(-1); right.append(-1); nsize.append(0)
            feature[slot] = f
            threshold[slot] = t
            left[slot] = lslot - base
            right[slot] = rslot - base
            stack.append((rows[mask], depth + 1, lslot))
            stack.append((rows[~mask], depth + 1, rslot))
        offsets.append(len(feature))

    forest = IForest(
        np.asarray(feature, dtype=np.int64),
        np.asarray(threshold, dtype=np.float64),
        np.asarray(left, dtype=np.int64),
        np.asarray(right, dtype=np.int64),
        np.asarray(nsize, dtype=np.int64),
        np.asarray(offsets, dtype=np.int64),
        psi,
    )
    # sklearn's fit-time offset_: the contamination quantile of the
    # training scores (IsolationForest.fit with contamination float)
    forest.offset_ = float(
        np.percentile(forest.score_samples(X), 100.0 * contamination)
    )
    return forest


def iforest_scores(
    df: DataFrame,
    id_col: str = "vec_id",
    features_col: str = "embedding",
    n_trees: int = 100,
    max_samples: int = 256,
    contamination: float = 0.1,
    threshold: float = -0.04,
    sample: int = 8192,
    seed: int = 0,
) -> DataFrame:
    """Distributed scoring: (id, score, is_anomaly) for every row.

    ``score`` is the sklearn decision_function analog; ``is_anomaly``
    replays model_manager.py:207's ``score < threshold`` verdict with
    drain3.ini's individual-model default −0.04. Training sample is
    md5(id)-ordered (stable across partitionings, the ann.py:189-207
    recipe); the broadcast model is a few KB of numpy arrays."""
    spark = df.sparkSession
    feats = df.select(
        F.col(id_col).alias("_id"),
        F.col(features_col).cast("array<double>").alias("_x"),
    ).filter(F.col("_x").isNotNull())
    train = (
        feats.orderBy(F.md5(F.col("_id").cast("string")), "_id")
        .limit(sample)
        .collect()
    )
    if not train:
        raise ValueError("iforest_scores: empty input")
    X = np.asarray([r["_x"] for r in train], dtype=np.float64)
    forest = fit_iforest(X, n_trees, max_samples, contamination, seed)
    bc = spark.sparkContext.broadcast(forest)

    # id passes through untouched — declare its REAL type (string ids
    # are first-class across the dedup/profile operators; hardcoding
    # long would make Arrow reject them at scoring time)
    id_type = feats.schema["_id"].dataType.simpleString()
    out_schema = f"`{id_col}` {id_type}, score double, is_anomaly boolean"

    def _score(batches):
        model = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.asarray(pdf["_x"].to_list(), dtype=np.float64)
            s = model.decision_function(M)
            yield pd.DataFrame(
                {
                    id_col: pdf["_id"].to_numpy(),
                    "score": s,
                    "is_anomaly": s < threshold,
                }
            )

    return feats.mapInPandas(_score, schema=out_schema)
