"""Similarity-search CLI: build a persisted IVF index over an
embedding table, then serve top-k queries against it.

The production split the operators were designed for
(operators/ann.py): TRAIN once on a bounded deterministic sample
(driver-side k-means++, corpus-size-independent), optionally POLISH at
corpus scale (distributed Lloyd), PERSIST the quantizer so cell ids
stay stable across runs, then QUERY with bounded nprobe cell scans.

    python -m anomalydetection_spark.ann_cli build \
        --vectors emb.parquet --index idx/ [--centroids 64] \
        [--refine-iters 1]
    python -m anomalydetection_spark.ann_cli query \
        --vectors emb.parquet --index idx/ --queries q.parquet \
        --out hits/ [--k 5] [--nprobe 8] [--exact]

`--exact` routes through the brute-force verification tier instead of
the index (recall baseline / small corpora). Outputs
(query_id, rank, neighbor_id, cos_sim) parquet.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def parse_args(argv=None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="ann_cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="train + persist an IVF quantizer")
    b.add_argument("--vectors", required=True,
                   help="embedding table parquet (vec_id, embedding)")
    b.add_argument("--index", required=True, help="output index dir")
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--centroids", type=int, default=64)
    b.add_argument("--sample", type=int, default=8192,
                   help="driver-side training sample bound")
    b.add_argument("--refine-iters", type=int, default=0,
                   help="full-corpus distributed Lloyd polish passes")
    b.add_argument("--master", default=None)

    q = sub.add_parser("query", help="top-k neighbors per query vector")
    q.add_argument("--vectors", required=True)
    q.add_argument("--queries", required=True,
                   help="query table parquet (same id/vec columns)")
    q.add_argument("--index", default=None,
                   help="IVF index dir from `build` (omit with --exact)")
    q.add_argument("--out", required=True, help="output parquet dir")
    q.add_argument("--id-col", default="vec_id")
    q.add_argument("--vec-col", default="embedding")
    q.add_argument("--k", type=int, default=5)
    q.add_argument("--nprobe", type=int, default=8)
    q.add_argument("--exact", action="store_true",
                   help="brute-force verification tier instead of IVF")
    q.add_argument("--master", default=None)
    return p.parse_args(argv)


def build_index(spark, args) -> dict:
    from .operators.ann import (
        refine_ivf_centroids,
        save_ivf_centroids,
        train_ivf_centroids,
    )

    vectors = spark.read.parquet(args.vectors)
    t0 = time.time()
    cent = train_ivf_centroids(
        vectors,
        id_col=args.id_col,
        vec_col=args.vec_col,
        n_centroids=args.centroids,
        sample=args.sample,
    )
    if args.refine_iters > 0:
        cent = refine_ivf_centroids(
            vectors, cent, id_col=args.id_col, vec_col=args.vec_col,
            iterations=args.refine_iters,
        )
    save_ivf_centroids(spark, cent, args.index)
    return {
        "mode": "build",
        "index": args.index,
        "n_centroids": int(cent.shape[0]),
        "dim": int(cent.shape[1]),
        "refine_iters": args.refine_iters,
        "seconds": round(time.time() - t0, 2),
    }


def query_index(spark, args) -> dict:
    from .operators.ann import (
        cosine_topk_exact,
        ivf_topk,
        load_ivf_centroids,
    )

    vectors = spark.read.parquet(args.vectors)
    queries = spark.read.parquet(args.queries)
    t0 = time.time()
    if args.exact:
        hits = cosine_topk_exact(
            vectors, queries, id_col=args.id_col, vec_col=args.vec_col,
            k=args.k,
        )
    else:
        if not args.index:
            raise SystemExit("query needs --index (or pass --exact)")
        cent = load_ivf_centroids(spark, args.index)
        hits = ivf_topk(
            vectors, queries, id_col=args.id_col, vec_col=args.vec_col,
            k=args.k, nprobe=args.nprobe, centroids=cent,
        )
    hits.write.mode("overwrite").parquet(args.out)
    out = spark.read.parquet(args.out)
    return {
        "mode": "query",
        "exact": bool(args.exact),
        "k": args.k,
        "n_queries": out.select("query_id").distinct().count(),
        "n_hits": out.count(),
        "out": args.out,
        "seconds": round(time.time() - t0, 2),
    }


def main(argv=None) -> int:
    args = parse_args(argv)
    from .session import get_spark

    spark = get_spark(app_name="ann_cli", master=args.master)
    try:
        if args.cmd == "build":
            print(json.dumps(build_index(spark, args)))
        else:
            print(json.dumps(query_index(spark, args)))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
