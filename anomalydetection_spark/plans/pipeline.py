"""End-to-end validation pipeline: the engine's analog of the
reference's per-file poll loop (/root/reference/main.py:136-275) →
ensemble pass (:277-357), restructured for Spark:

  manifest anti-join (partition discovery, S5)        — driver + 1 agg
  → per-partition checks (executors; the node boundary)
  → global merge + drift (one shuffle of bounded histograms)
  → verdicts + violations staged under run_id
  → atomic manifest commit (lineage + metrics)

Resume semantics: a crash before the manifest commit leaves CURRENT
pointing at the previous version; the next run's pending set is
unchanged and staged outputs under the dead run_id are simply
re-staged (idempotent, keyed on snapshot hash — S2/S5,
database_manager.py:84-103).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG, ValidationConfig
from ..operators import drift as drift_ops
from ..operators import stats as stats_ops
from ..operators.referential import orphan_refs, referential_verdicts
from ..operators.uniqueness import uniqueness_verdicts, uniqueness_violations
from ..operators.verdict import global_verdict
from ..sources.manifest import Manifest, partition_snapshots


@dataclass
class ValidationResult:
    verdicts: DataFrame          # per-partition + table-level rows
    violations: DataFrame        # exact violation rows (all checks)
    validated_partitions: list[int]
    manifest_version: int


def _violations_union(
    docs: DataFrame,
    catalog: DataFrame | None,
    spark: SparkSession,
    cfg: ValidationConfig,
    key_scope: DataFrame | None = None,
) -> DataFrame:
    """All checks' violation rows in VIOLATIONS_SCHEMA shape."""
    uniq = uniqueness_violations(
        docs, cfg.unique_key, cfg.salt_buckets, key_scope=key_scope
    ).select(
        F.lit("uniqueness").alias("check"),
        F.col("partition_id").cast("int"),
        "doc_id",
        F.concat(F.lit("dup_cnt="), F.col("dup_cnt")).alias("detail"),
        F.col("dup_cnt").cast("double").alias("score"),
        "spans",
    )
    conf = stats_ops.conformance_violations(docs).select(
        F.lit("conformance").alias("check"),
        F.col("partition_id").cast("int"),
        "doc_id",
        "detail",
        F.lit(1.0).alias("score"),
        "spans",
    )
    out = uniq.unionByName(conf)
    if catalog is not None:
        ref = orphan_refs(
            docs, catalog, spark, salt_buckets=cfg.salt_buckets
        )
        per_doc = ref.groupBy("doc_id", "partition_id").agg(
            F.sort_array(F.collect_set("media_ref")).alias("_refs"),
            F.count("*").alias("_n"),
        )
        refv = docs.join(per_doc, ["doc_id", "partition_id"], "inner").select(
            F.lit("referential").alias("check"),
            F.col("partition_id").cast("int"),
            "doc_id",
            F.concat(F.lit("orphan_refs="), F.concat_ws(",", "_refs")).alias(
                "detail"
            ),
            F.col("_n").cast("double").alias("score"),
            "spans",
        )
        out = out.unionByName(refv)
    return out


def run_validation(
    spark: SparkSession,
    docs: DataFrame,
    catalog: DataFrame | None = None,
    baseline_hist: DataFrame | None = None,
    manifest_dir: str | None = None,
    violations_dir: str | None = None,
    run_id: str = "run0",
    now: str = "1970-01-01T00:00:00Z",
    cfg: ValidationConfig = DEFAULT_CONFIG,
) -> ValidationResult:
    """Full constraint + drift pass with resumable checkpointing.

    ``now`` is injected (never wall-clock) for deterministic tests.
    """
    manifest = Manifest(manifest_dir) if manifest_dir else None

    snaps = partition_snapshots(docs).cache()
    if manifest is not None:
        pending = manifest.pending_partitions(snaps)
        manifest.acquire_leases(pending, run_id, now)
    else:
        pending = [r.partition_id for r in snaps.select("partition_id").collect()]
    pending = sorted(pending)

    # Partition pruning: only unvalidated partitions are read further.
    scope = docs.filter(F.col("partition_id").isin(pending)) if pending else None
    if scope is None or not pending:
        empty_v = spark.createDataFrame([], schema="check string, partition_id int, n_rows long, n_violations long, violation_rate double, score double, verdict string")
        from ..schema import VIOLATIONS_SCHEMA

        return ValidationResult(
            empty_v,
            spark.createDataFrame([], schema=VIOLATIONS_SCHEMA),
            [],
            manifest.current_version() if manifest else 0,
        )
    scope = scope.cache()

    # --- per-partition constraint verdicts ---
    # key_scope=docs: duplicate *detection* scans the full table's key
    # column (narrow, pruned scan) so cross-partition dups remain
    # visible to an incremental run; attribution stays within scope.
    verdicts = uniqueness_verdicts(
        scope, cfg.unique_key, salt_buckets=cfg.salt_buckets, key_scope=docs
    )
    verdicts = verdicts.unionByName(
        stats_ops.conformance_verdicts(
            scope, cfg.max_null_rate, cfg.max_type_error_rate
        )
    )
    if catalog is not None:
        verdicts = verdicts.unionByName(
            referential_verdicts(scope, catalog, spark, salt_buckets=cfg.salt_buckets)
        )

    # --- drift vs baseline histograms (bounded-size join) ---
    if baseline_hist is not None:
        cur_hist = stats_ops.length_histogram(
            scope, bins=cfg.drift.histogram_bins
        )
        dv = drift_ops.drift_verdicts(
            cur_hist,
            baseline_hist,
            keys=["kind"],
            psi_threshold=cfg.drift.psi_threshold_global,
            ks_threshold=cfg.drift.ks_threshold_global,
            check_prefix="drift_len",
        )
        verdicts = verdicts.unionByName(dv)

    # --- table-level rollup (the "ensemble" two-level verdict) ---
    verdicts = verdicts.unionByName(
        global_verdict(verdicts.filter(F.col("partition_id").isNotNull()))
    ).cache()

    violations = _violations_union(scope, catalog, spark, cfg, key_scope=docs)

    # --- stage violations under run_id, then commit manifest ---
    if violations_dir is not None:
        staged = os.path.join(violations_dir, f"_staged_{run_id}")
        violations.write.mode("overwrite").parquet(staged)
        violations = spark.read.parquet(staged)

    manifest_version = 0
    if manifest is not None:
        per_part = {
            r.partition_id: r
            for r in verdicts.filter(F.col("partition_id").isNotNull())
            .groupBy("partition_id")
            .agg(
                F.max("n_rows").alias("n_rows"),
                F.sum("n_violations").alias("n_violations"),
                F.max(F.when(F.col("verdict") == "fail", 1).otherwise(0)).alias(
                    "failed"
                ),
            )
            .collect()
        }
        snap_map = {r.partition_id: r for r in snaps.collect()}
        records = []
        for pid in pending:
            pr = per_part.get(pid)
            records.append(
                {
                    "partition_id": pid,
                    "snapshot_hash": snap_map[pid].snapshot_hash,
                    "n_rows": snap_map[pid].n_rows,
                    "n_violations": int(pr.n_violations) if pr and pr.n_violations is not None else 0,
                    "verdict": ("fail" if pr and pr.failed else "pass"),
                    "metrics": {
                        "n_rows": snap_map[pid].n_rows,
                        "run_id": run_id,
                    },
                }
            )
        manifest_version = manifest.commit_validated(records, run_id, now)

    return ValidationResult(verdicts, violations, pending, manifest_version)
