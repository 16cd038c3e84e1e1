"""Dump formatted physical plans for the headline operators → PLANS.md.

The things to verify in each plan (and what this report highlights):
- ``PushedFilters`` / narrow ``ReadSchema`` on every parquet scan
  (predicate pushdown + column pruning reached the source),
- ``BroadcastHashJoin`` where a small side exists (no accidental
  sort-merge of a dimension),
- ``WholeStageCodegen`` spans over the hot expressions (JVM-side, no
  Python in the row loop),
- ``partial_...`` aggregate modes before the exchange (map-side
  combine), and single exchanges where one shuffle suffices.

Usage: python tools/explain_plans.py [query ...] > plan dump; the
committed PLANS.md is the curated output.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

HEADLINE = [
    "uniqueness_dup_keys",
    "referential_orphans",
    "pricing_summary",
    "revenue_by_nation",
    "drift_psi",
    "rolling_3sigma",
    "dedup_first_wins",
    "cosine_topk",
    "ann_lsh_bucketed",
    "condense_multiline",
    "semantic_dedup",
    "kmeans_refine",
    "decontamination",
    "pii_scan",
    "asof_join_events",
    "quality_filter",
    "schema_contract",
    "source_overlap",
    "windowed_kind_drift",
    "embedding_stats",
    "range_join_events",
    "stratified_sample",
    "simhash_neardup",
    "bm25_topk",
    "containment_pairs",
    "unigram_logprob",
    "revenue_rollup",
]


def plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(plan: str) -> list[str]:
    notes = []
    scans = len(re.findall(r"Scan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]+\]", plan))
    notes.append(f"parquet scans: {scans} (with pushed filters: {pushed})")
    for pat, label in [
        (r"BroadcastHashJoin", "BroadcastHashJoin"),
        (r"SortMergeJoin", "SortMergeJoin"),
        (r"^\s*\*.*HashAggregate", "codegen'd HashAggregate"),
        (r"Exchange", "exchange (shuffle/broadcast)"),
        (r"partial_", "partial (map-side) agg function"),
        (r"ArrowEvalPython|FlatMapGroupsInPandas|MapInPandas", "Python/Arrow stage"),
    ]:
        n = len(re.findall(pat, plan, flags=re.MULTILINE))
        if n:
            notes.append(f"{label}: {n}")
    return notes


def main() -> None:
    from __spark_entry__ import queries
    from anomalydetection_spark.session import get_spark

    spark = get_spark(
        master="local[4]", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    names = sys.argv[1:] or HEADLINE
    qs = queries()
    for name in names:
        df = qs[name](spark, SF_DIR)
        plan = plan_text(df)
        print(f"\n## {name}\n")
        for n in summarize(plan):
            print(f"- {n}")
        print("\n```\n" + plan.strip()[:4000] + "\n```")
    spark.stop()


if __name__ == "__main__":
    main()
