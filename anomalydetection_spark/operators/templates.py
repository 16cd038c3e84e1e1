"""Log-template mining: a from-scratch Drain-style similarity-tree
miner (T1 option b — parity with the reference's incremental miner,
/root/reference/log_parser.py:157-190, configured by
/root/reference/drain3.ini:70-78: sim_th 0.4, depth 4, max_children
100, max_clusters 1024), distributed as per-partition mining +
template-level merge.

Algorithm (from the public Drain paper, He et al. 2017 — written from
the paper's description, no drain3 code): lines tokenize on
whitespace (+ ``_``); a fixed-depth prefix tree routes by token count
then the first ``depth − 2`` tokens (digit-bearing tokens and
overflowing children collapse to ``<*>``); each leaf holds template
clusters. A line joins the leaf cluster with the highest
equal-token ratio if it clears ``sim_th`` (mismatched positions
wildcard to ``<*>``), else founds a new cluster. ``max_clusters``
bounds state: when full, new lines force-join their best candidate —
memory is O(clusters · tokens) regardless of stream length.

Scale shape: the miner is sequential per partition (inherently
stateful — the documented custom-operator case for mapInPandas), so
stage 1 mines each partition independently and emits only (template,
size) rows — bounded at max_clusters per partition. Stage 2 re-mines
the ≤ P·max_clusters templates (size-weighted) in one task for the
global dictionary: the same partial→merge shape as every other
sketch in this engine. Row data never leaves stage 1.

The masking→groupBy approximation (queries.py masking_templates)
remains the cheap declarative tier; tests compare the two on a
deterministic fixture.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WILDCARD = "<*>"
_HAS_DIGIT = re.compile(r"\d")


class DrainMiner:
    """Bounded incremental template miner (one instance per partition)."""

    def __init__(
        self,
        sim_th: float = 0.4,
        depth: int = 4,
        max_children: int = 100,
        max_clusters: int = 1024,
    ):
        self.sim_th = sim_th
        self.prefix_len = max(depth - 2, 0)
        self.max_children = max_children
        self.max_clusters = max_clusters
        # tree: (token_count, tok_1..tok_prefix) -> list[cluster_id]
        self.leaves: dict[tuple, list[int]] = {}
        self.children: dict[tuple, set[str]] = {}
        self.templates: dict[int, list[str]] = {}
        self.sizes: dict[int, float] = {}
        self._next_id = 0

    @staticmethod
    def tokenize(line: str) -> list[str]:
        return line.replace("_", " ").split()

    def _leaf_key(self, toks: list[str]) -> tuple:
        key: list = [len(toks)]
        for i in range(min(self.prefix_len, len(toks))):
            tok = toks[i]
            if _HAS_DIGIT.search(tok):
                tok = WILDCARD
            if tok != WILDCARD:
                # max_children per internal node: overflow collapses to <*>
                node = tuple(key)
                kids = self.children.setdefault(node, set())
                if tok not in kids:
                    if len(kids) >= self.max_children:
                        tok = WILDCARD
                    else:
                        kids.add(tok)
            key.append(tok)
        return tuple(key)

    @staticmethod
    def _sim(template: list[str], toks: list[str]) -> float:
        if not template:
            return 0.0
        eq = sum(1 for a, b in zip(template, toks) if a == b and a != WILDCARD)
        return eq / len(template)

    def add(self, line: str, weight: float = 1.0) -> int:
        toks = self.tokenize(line)
        if not toks:
            toks = [""]
        key = self._leaf_key(toks)
        leaf = self.leaves.setdefault(key, [])
        best_id, best_sim = None, -1.0
        for cid in leaf:
            s = self._sim(self.templates[cid], toks)
            if s > best_sim:
                best_id, best_sim = cid, s
        full = len(self.templates) >= self.max_clusters
        if best_id is not None and (best_sim >= self.sim_th or full):
            t = self.templates[best_id]
            self.templates[best_id] = [
                a if a == b else WILDCARD for a, b in zip(t, toks)
            ]
            self.sizes[best_id] += weight
            return best_id
        if full:
            # leaf empty and dictionary full: reuse a catch-all per leaf
            cid = leaf[0] if leaf else min(self.templates)
            self.sizes[cid] += weight
            return cid
        cid = self._next_id
        self._next_id += 1
        leaf.append(cid)
        self.templates[cid] = list(toks)
        self.sizes[cid] = weight
        return cid

    def result_rows(self) -> list[dict]:
        return [
            {
                "template": " ".join(self.templates[cid]),
                "size": float(self.sizes[cid]),
            }
            for cid in sorted(self.templates)
        ]


def _mine_pdf_iter(
    batches: Iterator[pd.DataFrame],
    col: str,
    weight_col: str | None,
    **kw,
) -> Iterator[pd.DataFrame]:
    miner = DrainMiner(**kw)
    for pdf in batches:
        texts = pdf[col]
        weights = pdf[weight_col] if weight_col else None
        for i, line in enumerate(texts):
            miner.add(
                line if isinstance(line, str) else "",
                float(weights.iloc[i]) if weights is not None else 1.0,
            )
    rows = miner.result_rows()
    if rows:
        yield pd.DataFrame(rows)


def mine_templates(
    df: DataFrame,
    text_col: str = "text",
    sim_th: float = 0.4,
    depth: int = 4,
    max_children: int = 100,
    max_clusters: int = 1024,
) -> DataFrame:
    """Distributed template dictionary: (cluster_id, template, size).

    Stage 1 mines each partition independently (bounded miner state);
    stage 2 re-mines the per-partition templates size-weighted in a
    single task (≤ P·max_clusters tiny rows — never row data). Output
    ids are dense ranks by (size desc, template) for determinism.
    """
    kw = dict(
        sim_th=sim_th,
        depth=depth,
        max_children=max_children,
        max_clusters=max_clusters,
    )

    def stage1(batches):
        return _mine_pdf_iter(batches, text_col, None, **kw)

    partials = df.select(F.col(text_col).cast("string").alias(text_col)).mapInPandas(
        stage1, schema="template string, size double"
    )

    def stage2(batches):
        # deterministic merge order regardless of partition arrival
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(
            ["size", "template"], ascending=[False, True], kind="mergesort"
        )
        yield from _mine_pdf_iter(iter([pdf]), "template", "size", **kw)

    merged = partials.coalesce(1).mapInPandas(
        stage2, schema="template string, size double"
    )
    w = Window.orderBy(F.desc("size"), F.asc("template"))
    return merged.select(
        F.row_number().over(w).cast("long").alias("cluster_id"),
        "template",
        F.col("size").cast("long").alias("size"),
    )


def store_templates(
    templates: DataFrame, out_dir: str, run_id: str
) -> str:
    """K5 parsed-log/template sink — the working version of the
    reference's dead ``store_logs_drain3``
    (/root/reference/database_manager.py:105-121, unreachable after its
    first ``return True``): persist the mined template dictionary under
    the run id, stamped so successive runs are comparable."""
    import os

    path = os.path.join(out_dir, "templates", run_id)
    templates.withColumn("run_id", F.lit(run_id)).write.mode(
        "overwrite"
    ).parquet(path)
    return path


def load_templates(spark, out_dir: str, run_id: str) -> DataFrame:
    import os

    return spark.read.parquet(os.path.join(out_dir, "templates", run_id))
