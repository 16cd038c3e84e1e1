"""sf1 heavy-tier evidence run (round-5 verdict item: the 100 TB
design claims — LSH banding, hot-bucket guard, setsim prefix filter,
IVF — had only sf0.1 measurements).

Synthesizes a deterministic 10x-sf0.1 corpus (50k flat documents with
the same vocabulary/shape/dup-structure as the driver's testdata, 20k
64-dim embeddings) under /tmp/sf1_heavy, then times the UNBOUNDED
heavy-tier operators on it and records the scale knees: band
bucket-size distributions, hot-bucket guard engagement, candidate and
verified-pair masses. Usage:

    python tools/bench_heavy_sf1.py [scale]   # scale=10 -> 50k docs

Prints one JSON line; the numbers land in BASELINE.md's sf1 section.
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VOCAB = (
    "batch part spark line column order small sort fast value scan a "
    "hash slow vector query agg table the key group filter customer "
    "stream big merge join stage row plan shuffle"
).split()

WORK = os.environ.get("SF1_WORK_DIR", "/tmp/sf1_heavy")


def synth_documents(spark, n_docs: int):
    """Same shape as testdata documents (doc_id, text, lang, source,
    n_chars): 31-word vocab, ~10-120 word docs, ~0.2% exact duplicates
    and ~2% one-word-mutation near-dups of earlier docs (the structure
    every dedup tier keys on). Seeded; driver-side generation is fine
    at this metadata scale (50k rows, ~15 MB)."""
    rng = random.Random(42)
    langs = ["en", "en", "en", "de", "fr", "zh"]
    rows = []
    texts: list[str] = []
    for i in range(n_docs):
        r = rng.random()
        if i > 100 and r < 0.002:
            text = texts[rng.randrange(len(texts))]  # exact dup
        elif i > 100 and r < 0.022:
            words = texts[rng.randrange(len(texts))].split()
            words[rng.randrange(len(words))] = rng.choice(VOCAB)
            text = " ".join(words)  # near-dup
        else:
            m = 10 + int(110 * rng.random() ** 2)
            text = " ".join(rng.choice(VOCAB) for _ in range(m))
        texts.append(text)
        rows.append(
            (
                i,
                text,
                langs[rng.randrange(len(langs))],
                f"src{rng.randrange(20)}",
                len(text),
            )
        )
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    )


def synth_embeddings(spark, n_vecs: int, dim: int = 64):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(42)
    centers = rng.normal(0, 1.0, size=(10, dim))
    labels = rng.integers(0, 10, size=n_vecs)
    vecs = centers[labels] + rng.normal(0, 0.35, size=(n_vecs, dim))
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n_vecs, dtype="int64"),
            "embedding": [v.astype("float32").tolist() for v in vecs],
            "label": labels.astype("int32"),
        }
    )
    return spark.createDataFrame(pdf)


def _timed(fn, repeats: int = 2):
    fn()  # warm
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        n = fn()
        ts.append(round(time.time() - t0, 3))
    return min(ts), n, ts


def band_stats(bands_df, cap: int):
    """Bucket-size distribution + guard engagement for a band table."""
    from pyspark.sql import functions as F

    sizes = bands_df.groupBy("band", "bucket").agg(
        F.count("*").alias("m")
    )
    row = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("m").alias("max_bucket"),
        F.expr("percentile(m, 0.99)").alias("p99_bucket"),
        F.sum(F.when(F.col("m") > cap, 1).otherwise(0)).alias(
            "n_hot_over_cap"
        ),
        F.sum(
            F.when(F.col("m") > cap, F.col("m")).otherwise(0)
        ).alias("rows_dropped_by_guard"),
        F.sum(F.col("m") * F.col("m")).alias("pair_mass_unguarded"),
        F.sum(
            F.when(F.col("m") <= cap, F.col("m") * F.col("m")).otherwise(0)
        ).alias("pair_mass_guarded"),
    ).collect()[0]
    return {k: (float(v) if v is not None else None) for k, v in row.asDict().items()}


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    n_docs, n_vecs = 5000 * scale, 2000 * scale
    from pyspark.sql import functions as F

    from anomalydetection_spark.session import get_spark

    spark = get_spark(
        app_name="bench_heavy_sf1",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    os.makedirs(WORK, exist_ok=True)
    dp = os.path.join(WORK, f"documents_{n_docs}")
    ep = os.path.join(WORK, f"embeddings_{n_vecs}")
    if not os.path.exists(os.path.join(dp, "_SUCCESS")):
        synth_documents(spark, n_docs).repartition(32).write.mode(
            "overwrite"
        ).parquet(dp)
    if not os.path.exists(os.path.join(ep, "_SUCCESS")):
        synth_embeddings(spark, n_vecs).repartition(16).write.mode(
            "overwrite"
        ).parquet(ep)
    docs = spark.read.parquet(dp)
    emb = spark.read.parquet(ep)

    from anomalydetection_spark.operators.ann import ann_lsh_topk, ivf_topk
    from anomalydetection_spark.operators.dedup import (
        band_keys,
        duplicate_clusters,
        minhash_lsh_pairs,
        setsim_prefix_pairs,
        shingle_tokenizer,
        simhash_fingerprints,
        simhash_pairs,
    )
    from anomalydetection_spark.operators.dedup_incremental import DedupIndex

    out: dict = {"n_docs": n_docs, "n_vecs": n_vecs, "scale": scale}
    timings: dict = {}
    counts: dict = {}

    def run(name, fn):
        t, n, all_ts = _timed(fn)
        timings[name] = t
        counts[name] = n
        print(f"{name}: {t}s ({n} rows; runs {all_ts})", file=sys.stderr)

    CAP = 200  # guard cap for the full-corpus tier

    run(
        "minhash_lsh_pairs",
        lambda: minhash_lsh_pairs(
            docs, "doc_id", "text", n_hashes=8, bands=4, threshold=0.8,
            max_bucket_size=CAP,
        ).count(),
    )
    run(
        "dedup_clusters",
        lambda: duplicate_clusters(
            minhash_lsh_pairs(
                docs, "doc_id", "text", n_hashes=8, bands=4,
                threshold=0.8, max_bucket_size=CAP,
            )
        ).count(),
    )
    run(
        "setsim_prefix_join",
        lambda: setsim_prefix_pairs(
            docs, "doc_id", "text", threshold=0.85,
            tokenizer=shingle_tokenizer(3),
        ).count(),
    )
    run(
        "simhash_neardup",
        lambda: simhash_pairs(
            docs, "doc_id", "text", bits=60, max_hamming=3,
            max_bucket_size=50,
        ).count(),
    )

    def _incremental():
        # the hot-bucket guard is NOT optional at this scale: the
        # 31-word vocabulary makes r=2 minhash band buckets hold >60%
        # of the corpus, and the unguarded self-join spilled the disk
        # to death at 50k docs (the knee this runner exists to record)
        state = os.path.join(WORK, "dedup_idx")
        shutil.rmtree(state, ignore_errors=True)
        idx = DedupIndex(
            state, n_hashes=8, bands=4, threshold=0.8,
            max_bucket_size=CAP,
        )
        idx.build(docs.filter(F.col("doc_id") % 10 != 0))
        res = idx.update(docs.filter(F.col("doc_id") % 10 == 0))
        return res["assignments"].count()

    run("dedup_increment_build_plus_delta", _incremental)

    q100 = emb.filter(F.col("vec_id") < 100)
    run(
        "ann_lsh_bucketed",
        lambda: ann_lsh_topk(
            emb, q100, "vec_id", "embedding", k=10, n_tables=4,
            bits_per_table=8, max_bucket_size=2000,
        ).count(),
    )
    run(
        "ann_ivf",
        lambda: ivf_topk(
            emb, q100, "vec_id", "embedding", k=10, n_centroids=64,
            nprobe=8,
        ).count(),
    )

    # --- scale knees: band skew + guard engagement ---
    knees = {}
    mh_bands = band_keys(docs, "doc_id", "text", 8, 4, None)
    knees["minhash_bands"] = band_stats(mh_bands, CAP)
    fps = simhash_fingerprints(docs, "doc_id", "text", 60, None)
    sh_bands = fps.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(
                            f"shiftright(simhash, {b * 15}) & 32767L"
                        ).alias("bucket"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    knees["simhash_bands"] = band_stats(sh_bands, 50)

    out.update({"timings_sec": timings, "result_rows": counts,
                "knees": knees})
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
