"""Micro-profile the wide violations stage's components at one core
count: pure spans scan, conformance flags only, full _all_violations,
and the verdict aggregation. python tools/profile_viol.py <ncores>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F


def main() -> None:
    ncores = int(sys.argv[1])
    from bench import _fresh_spark, _materialize_bench_tables
    from anomalydetection_spark.plans import pipeline as P

    spark = _fresh_spark(ncores)
    docs_path, cat_path, base_path = _materialize_bench_tables(spark)
    docs = spark.read.parquet(docs_path)
    catalog = spark.read.parquet(cat_path)

    t = {}

    def clock(name, fn):
        t0 = time.time()
        r = fn()
        t[name] = round(time.time() - t0, 3)
        return r

    clock("scan_spans_sum", lambda: docs.select(
        F.sum(F.size("spans"))).collect())
    dups = clock("dup_scan", lambda: P.duplicate_keys(
        docs, "doc_id", 8).cache())
    clock("dup_count", dups.count)
    # conformance flags only (dups joined but empty-ish), count of flagged
    clock("conformance_only", lambda: P._all_violations(
        docs, dups, None, True).filter(
        F.col("check").isin("conformance")).count())
    orphans = P.orphan_refs(docs, catalog, spark, salt_buckets=8)
    orphan_doc = (
        orphans.groupBy("doc_id", "partition_id")
        .agg(F.sort_array(F.collect_set("media_ref")).alias("orphan_refs"),
             F.count("*").alias("n_orphans")).cache())
    clock("orphan_count", orphan_doc.count)
    n_orph = orphan_doc.count()
    bc = n_orph <= P.BROADCAST_MAX_ROWS
    t["n_orphan_docs"] = n_orph
    t["broadcast_orphans"] = bc
    viol = P._all_violations(docs, dups, orphan_doc, bc).cache()
    clock("all_violations_count", viol.count)
    totals = docs.groupBy("partition_id").agg(F.count("*").alias("n_rows"))
    verd = P._verdicts_from_violations(viol, totals, has_catalog=True,
                                       cfg=P.DEFAULT_CONFIG)
    clock("verdicts_agg", verd.count)
    print(json.dumps({"ncores": ncores, **t}))


if __name__ == "__main__":
    main()
