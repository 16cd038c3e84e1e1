"""End-to-end lifecycle demo — every stage a real deployment runs,
at toy scale (~20k docs, finishes in about a minute on local[8]):

1. generate the interleaved documents fixture + media catalog
2. SUGGEST a contract from the data (operators/suggest.py)
3. VALIDATE: full constraint + drift pass with a checkpoint manifest
   (+ keep-and-tag: the suggested contract annotates rows in place)
4. RESUME: re-run validates nothing (per-partition lineage)
5. PROFILE incrementally: second round scans only the appended
   partitions; moment + distribution drift come from stored state
6. DEDUP: LSH near-dup split (kept / duplicate)
7. JSON payload arm: synthesize a props column, auto-DETECT it,
   SUGGEST a JSON-shape rule, VALIDATE it, keep-and-tag the type-mix
   rows (operators/semistructured.py + contract JsonRule)
8. WATCH ITSELF: simulated later runs extend the manifest's metric
   history; the EMA+3σ metric-anomaly rule flags the regression run
   from the stored series alone (operators/metric_history.py)
9. REPAIR: plant nulls into a copy of the corpus, plan median/mode
   imputation (operators/repair.py), apply it with per-row lineage,
   and reconcile repaired-cell counts against the plan

Usage: python examples/lifecycle.py [workdir]
(workdir defaults to a fresh temp directory)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(workdir: str | None = None, stop: bool = True) -> dict:
    from pyspark.sql import functions as F

    from anomalydetection_spark.fixtures import (
        generate_documents,
        generate_media_catalog,
    )
    from anomalydetection_spark.operators.dedup import write_dedup_split
    from anomalydetection_spark.operators.incremental_profile import (
        IncrementalProfiler,
    )
    from anomalydetection_spark.operators.suggest import suggest_contract
    from anomalydetection_spark.plans.pipeline import run_validation
    from anomalydetection_spark.session import get_spark

    wd = workdir or tempfile.mkdtemp(prefix="lifecycle_")
    os.makedirs(wd, exist_ok=True)
    spark = get_spark(app_name="lifecycle_demo", master="local[8]")
    summary: dict = {"workdir": wd}

    # 1. fixture corpus (planted violations) + media catalog
    docs = generate_documents(spark, 20_000, n_partitions=8, seed=7)
    docs_path = os.path.join(wd, "documents")
    docs.write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)
    catalog = generate_media_catalog(spark, 10_000, seed=7)

    # 2. suggest a contract from the data itself
    contract, unique_candidates = suggest_contract(docs)
    summary["suggested_columns"] = sorted(contract["columns"])
    summary["unique_candidates"] = unique_candidates

    # 3. full validation round (uniqueness, referential, conformance,
    #    drift) with a versioned manifest
    res = run_validation(
        spark, docs, catalog=catalog,
        manifest_dir=os.path.join(wd, "manifest"), run_id="r1",
    )
    failed = (
        res.verdicts.filter(F.col("verdict") == "fail")
        .groupBy("check").count().collect()
    )
    summary["failed_checks"] = {r["check"]: r["count"] for r in failed}
    summary["n_violations"] = res.violations.count()

    # 3b. keep-and-tag: the suggested contract annotates every row
    #     with the rules it violates (no drops — the row-level
    #     complement of the quarantine split)
    from anomalydetection_spark.operators.contract import (
        annotate_violations,
        contract_from_dict,
        contract_verdicts,
    )

    ann = annotate_violations(docs, contract_from_dict(contract))
    summary["n_tagged_rows"] = ann.filter(
        F.size("violations") > 0
    ).count()

    # 4. resume: nothing left to validate
    res2 = run_validation(
        spark, docs, catalog=catalog,
        manifest_dir=os.path.join(wd, "manifest"), run_id="r2",
    )
    summary["resume_validated"] = res2.validated_partitions  # == []

    # 5. incremental profiling: round 1 scans all partitions, an
    #    appended partition costs only itself; drift comes from state
    ip = IncrementalProfiler(os.path.join(wd, "profile_state"))
    docs_len = docs.withColumn(
        "_text_len",
        F.expr(
            "aggregate(transform(coalesce(spans, array()),"
            " s -> length(coalesce(s.text, ''))), 0, (a, x) -> a + x)"
        ).cast("double"),
    )
    p1 = ip.update(
        docs_len, "partition_id", run_id="p1", quantile_cols=["_text_len"]
    )
    appended = docs_len.unionByName(
        docs_len.filter(F.col("partition_id") == 0).withColumn(
            "partition_id", F.lit(99).cast(
                docs_len.schema["partition_id"].dataType.simpleString()
            )
        ).withColumn("_text_len", F.col("_text_len") * 3)
    )
    p2 = ip.update(
        appended, "partition_id", run_id="p2", quantile_cols=["_text_len"]
    )
    summary["profile_round2_scanned"] = p2["profiled_partitions"]
    summary["profile_round2_reused"] = len(p2["reused_partitions"])
    drift = ip.drift_since(spark, base_version=p1["version"])
    summary["profile_drift_failures"] = sorted(
        f"{r['column']}.{r['metric']}"
        for r in drift.filter(F.col("verdict") == "fail").collect()
    )
    qd = ip.quantile_drift_since(spark, base_version=p1["version"])
    summary["distribution_drift"] = {
        r["column"]: r["verdict"] for r in qd.collect()
    }

    # 6. near-dup split on the flattened span text: kept / duplicate
    #    partitioned write (one pass, broadcast duplicate-id set)
    flat = docs.withColumn(
        "text",
        F.expr(
            "array_join(transform(coalesce(spans, array()),"
            " s -> coalesce(s.text, '')), ' ')"
        ),
    )
    split = write_dedup_split(
        flat, os.path.join(wd, "dedup"), id_col="doc_id", text_col="text",
        max_bucket_size=100,
    )
    summary["dedup"] = {
        k: split[k] for k in ("n_kept", "n_duplicates", "n_clusters")
        if k in split
    }

    # 7. JSON payload arm: a props column with a planted type-mix bug
    #    (every 50th doc's "k" is a string) and a planted truncation
    #    (every 97th doc malformed). detect -> suggest -> validate ->
    #    keep-and-tag, all through the same contract system.
    from anomalydetection_spark.operators.suggest import (
        detect_json_columns,
    )

    h = F.abs(F.xxhash64("doc_id"))
    payload = docs.select(
        "doc_id",
        F.when(h % 97 == 0, F.lit('{"k": '))
        .when(
            h % 50 == 0,
            F.concat(F.lit('{"k": "v'), (h % 9).cast("string"), F.lit('"}')),
        )
        .otherwise(
            F.concat(F.lit('{"k": '), (h % 1000).cast("string"), F.lit("}"))
        )
        .alias("props"),
    )
    jcols = detect_json_columns(payload)
    summary["json_detected"] = jcols  # ['props']; doc_id is not JSON
    jcontract, _ = suggest_contract(payload, columns=["props"])
    jrule = jcontract["json"]["props"]
    summary["json_suggested"] = {
        "required": jrule["required"],
        "types": jrule["types"],
        "max_malformed_rate": jrule["max_malformed_rate"],
    }
    jv = contract_verdicts(
        payload, contract_from_dict({"json": jcontract["json"]})
    )
    summary["json_verdicts"] = {
        r["check"]: r["verdict"]
        for r in jv.filter(F.col("check").startswith("rule:")).collect()
    }
    tagged = annotate_violations(
        payload,
        contract_from_dict(
            {"json": {"props": {"required": ["k"],
                                "types": {"k": ["number"]}}}}
        ),
    )
    summary["json_type_mix_rows"] = tagged.filter(
        F.array_contains("violations", "props::json_type:k")
    ).count()

    # 8. the engine watching itself: replay a (simulated) week of
    #    later validation runs into the SAME manifest's metric history
    #    — calm rounds with jittered violation counts, then one
    #    regression round at 10× — and let the reference's EMA+3σ
    #    running-score rule flag the regression run from the metric
    #    series alone (operators/metric_history.py, no data scan)
    from anomalydetection_spark.operators.metric_history import (
        metric_run_anomaly,
    )
    from anomalydetection_spark.sources.manifest import Manifest

    m = Manifest(os.path.join(wd, "manifest"))
    state = m.load()
    for i in range(3, 10):
        spike = 10 if i == 9 else 1
        m.commit_validated(
            [
                {
                    "partition_id": rec["partition_id"],
                    "snapshot_hash": f"sim-{i}-{pid}",
                    "n_rows": rec["n_rows"],
                    "n_violations": spike
                    * (int(rec["n_violations"] or 0) + (i * 13 + int(pid)) % 7),
                    "verdict": rec["verdict"],
                }
                for pid, rec in state.items()
            ],
            f"r{i}",
            f"2024-01-0{i}T00:00:00",
        )
    ma = metric_run_anomaly(spark, os.path.join(wd, "manifest"))
    flagged = ma.filter(F.col("is_anomaly")).collect()
    last_v = max(r["version"] for r in ma.collect())
    summary["metric_anomaly_flagged"] = sorted(
        {r["metric"] for r in flagged if r["version"] == last_v}
    )

    # 9. repair: a failed completeness gate's next step — plant nulls
    #    into a projection of the corpus, plan median/mode fills,
    #    apply with per-row lineage, and prove cell conservation
    from anomalydetection_spark.operators.repair import (
        apply_repairs,
        plan_repairs,
    )

    did = F.substring("doc_id", 4, 12).cast("long")  # "doc123" -> 123
    broken = docs.select(
        "doc_id",
        F.when(did % 9 != 0, F.size("spans").cast("double")).alias(
            "n_spans"
        ),
        F.when(did % 11 != 0, F.lit("batch-a")).alias("batch"),
    )
    rules = plan_repairs(broken, columns=["n_spans", "batch"])
    repaired = apply_repairs(broken, rules)
    n_planned = sum(r.n_null for r in rules if r.strategy != "refuse")
    n_cells = repaired.agg(
        F.sum(F.size("__repaired"))
    ).collect()[0][0]
    summary["repair_rules"] = {
        r.column: r.strategy for r in rules
    }
    summary["repair_reconciled"] = int(n_cells or 0) == n_planned
    assert summary["repair_reconciled"]

    if stop:
        spark.stop()
    return summary


if __name__ == "__main__":
    out = main(sys.argv[1] if len(sys.argv) > 1 else None)
    print(json.dumps(out, indent=2))
