"""Benchmark harness (driver contract).

Runs the operator catalog at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line: {"metric", "value" (total sec), "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Also measures the authoritative BASELINE.json metric —
**validated-docs/sec** for the full constraint + drift pass over a
generated interleaved documents table — and, unless
``BENCH_SCALING=0``, the two-cluster-size scaling evidence: the same
job on the same parquet input at local[8] vs local[32]
(sandbox substitute for N vs 4N executors; north_rule gate:
efficiency = rate32 / (4 * rate8) >= 0.8).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS_BENCH = int(os.environ.get("BENCH_N_DOCS", "150000"))
DO_SCALING = os.environ.get("BENCH_SCALING", "1") != "0"
WORK_DIR = os.environ.get("BENCH_WORK_DIR", "/tmp/anomalydetection_bench")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def _fresh_spark(ncores: int):
    from anomalydetection_spark.session import get_spark

    return get_spark(
        app_name=f"bench_local{ncores}",
        master=f"local[{ncores}]",
        shuffle_partitions=max(32, ncores),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )


def _materialize_bench_tables(spark) -> tuple[str, str]:
    """Generate the interleaved documents corpus + media catalog once
    (deterministic, seed 42) and persist as parquet — the SAME input
    bytes feed every parallelism level."""
    from anomalydetection_spark.fixtures import (
        generate_documents,
        generate_media_catalog,
    )

    docs_path = os.path.join(WORK_DIR, f"documents_{N_DOCS_BENCH}")
    cat_path = os.path.join(WORK_DIR, "media_catalog")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        shutil.rmtree(docs_path, ignore_errors=True)
        generate_documents(
            spark, N_DOCS_BENCH, seed=42, n_partitions=64, n_media=50_000
        ).repartition(64).write.mode("overwrite").parquet(docs_path)
    if not os.path.exists(os.path.join(cat_path, "_SUCCESS")):
        shutil.rmtree(cat_path, ignore_errors=True)
        generate_media_catalog(spark, 50_000, seed=42).write.mode(
            "overwrite"
        ).parquet(cat_path)
    return docs_path, cat_path


def _run_validation_pass(spark, docs_path: str, cat_path: str) -> tuple[float, int]:
    """One full constraint + drift pass; returns (seconds, n_docs)."""
    from anomalydetection_spark.operators.stats import length_histogram
    from anomalydetection_spark.plans.pipeline import run_validation

    docs = spark.read.parquet(docs_path)
    catalog = spark.read.parquet(cat_path)
    baseline = length_histogram(docs, bins=64, bin_width=8)

    t0 = time.time()
    res = run_validation(spark, docs, catalog=catalog, baseline_hist=baseline)
    n_verd = res.verdicts.count()
    n_viol = res.violations.count()
    dt = time.time() - t0
    assert n_verd > 0 and n_viol > 0
    n_docs = docs.count()
    return dt, n_docs


def main() -> None:
    os.makedirs(WORK_DIR, exist_ok=True)
    from __spark_entry__ import queries

    per_query: dict[str, float] = {}
    spark = _fresh_spark(CPUS)

    # --- operator catalog at the driver's SF dir ---
    for name, fn in queries().items():
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.count()
        per_query[name] = round(time.time() - t0, 3)

    # --- flagship: full validation pass over the interleaved corpus ---
    docs_path, cat_path = _materialize_bench_tables(spark)
    _run_validation_pass(spark, docs_path, cat_path)  # warm (JIT/codegen)
    dt, n_docs = _run_validation_pass(spark, docs_path, cat_path)
    per_query["validation_full_pass"] = round(dt, 3)
    docs_per_sec = n_docs / dt

    extra: dict = {
        "validated_docs_per_sec": round(docs_per_sec, 1),
        "bench_n_docs": n_docs,
    }

    # --- scaling evidence: same input, local[8] vs local[32] ---
    if DO_SCALING:
        spark.stop()
        rates = {}
        for n in (8, 32):
            s = _fresh_spark(n)
            _run_validation_pass(s, docs_path, cat_path)  # warm
            dts, nd = _run_validation_pass(s, docs_path, cat_path)
            rates[n] = nd / dts
            s.stop()
        extra["scaling"] = {
            "docs_per_sec_local8": round(rates[8], 1),
            "docs_per_sec_local32": round(rates[32], 1),
            "efficiency_8_to_32": round(rates[32] / (4.0 * rates[8]), 3),
        }
    else:
        spark.stop()

    out = {
        "metric": "validated-docs/sec (full constraint + drift pass)",
        "value": round(sum(per_query.values()), 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_from_dir(SF_DIR),
        **extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
