"""operators/ann.py + operators/dedup.py: multi-table recall
amplification, skew guard, and LSH-vs-exact consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.ann import (
    ann_lsh_topk,
    cosine_topk_exact,
    ivf_topk,
)
from anomalydetection_spark.operators.dedup import minhash_lsh_pairs

SF_DIR = "/root/testdata/sf0.1"


def _topk_pairs(df):
    return {(r.query_id, r.neighbor_id) for r in df.collect()}


def test_multi_table_recall_amplification(spark):
    """OR-amplification is monotone in table count, and the
    diffuse-corpus configuration (4 bits × 16 tables — the S-curve
    setting for neighbors at cosine ~0.4) clears 0.9 recall@3 on
    sf0.1 (0.933 measured)."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    exact = _topk_pairs(cosine_topk_exact(e, q, k=3))
    r = {}
    for nt, bits in ((1, 8), (4, 8), (16, 4)):
        got = _topk_pairs(
            ann_lsh_topk(e, q, k=3, n_tables=nt, bits_per_table=bits)
        )
        r[(nt, bits)] = len(got & exact) / len(exact)
    assert r[(4, 8)] >= r[(1, 8)]
    assert r[(16, 4)] >= 0.9, r


def test_lsh_recall_vs_formula_table(spark):
    """The (bits, tables) tuning formula in ann.py's docstring is
    EVIDENCE, not prose: for each config, measured recall@3 on sf0.1
    tracks the per-pair prediction mean(1 − (1 − p^b)^L) with
    p = 1 − θ/π, and recall is monotone in L (OR-amplification) and
    antitone in b (stricter buckets). Also emits the measured
    recall / scan-fraction table the README points at.

    (b=8, L=16 is NOT in the grid: axis-aligned tables need
    n_tables × bits ≤ dim = 64.)"""
    import math

    import numpy as np

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    exact = cosine_topk_exact(e, q, k=3)
    pairs = exact.collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in pairs}

    # scan fraction per config, computed from the actual bucketing
    emb = np.array(
        [r.embedding for r in e.select("embedding").collect()]
    )
    qids = sorted({r.query_id for r in pairs})
    vid = [r.vec_id for r in e.select("vec_id").collect()]
    qidx = [vid.index(i) for i in qids]
    n = emb.shape[0]

    def scan_fraction(b, L):
        signs = emb > 0
        cand = np.zeros((len(qidx), n), dtype=bool)
        for t in range(L):
            sl = signs[:, t * b:(t + 1) * b]
            codes = sl.dot(1 << np.arange(b))
            cand |= codes[qidx][:, None] == codes[None, :]
        return cand.sum() / (len(qidx) * n)

    table = {}
    for b, L in ((4, 4), (4, 16), (8, 4), (8, 8)):
        got = _topk_pairs(
            ann_lsh_topk(e, q, k=3, n_tables=L, bits_per_table=b)
        )
        recall = len(got & exact_set) / len(exact_set)
        pred = float(
            np.mean(
                [
                    1.0
                    - (1.0 - (1.0 - math.acos(
                        max(-1.0, min(1.0, r.cos_sim))) / math.pi) ** b)
                    ** L
                    for r in pairs
                ]
            )
        )
        table[(b, L)] = (recall, pred, scan_fraction(b, L))

    print("\n  b   L   recall  predicted  scan_frac")
    for (b, L), (rec, pred, sf) in sorted(table.items()):
        print(f"  {b}  {L:>2}   {rec:.3f}   {pred:.3f}      {sf:.3f}")

    for (b, L), (rec, pred, _) in table.items():
        # axis-aligned signs on this synthetic corpus track the random-
        # hyperplane formula within a wide-but-meaningful band
        assert abs(rec - pred) <= 0.2, (b, L, rec, pred)
    # monotone in L at fixed b; antitone in b at fixed L
    assert table[(4, 16)][0] >= table[(4, 4)][0]
    assert table[(8, 8)][0] >= table[(8, 4)][0]
    assert table[(4, 4)][0] >= table[(8, 4)][0]
    # more tables buy recall with more scan: the cost side is real too
    assert table[(4, 16)][2] >= table[(4, 4)][2]


def test_ivf_recall_at_bounded_scan(spark):
    """IVF (64 cells, 8 probes ≈ 12.5% scan) beats same-cost LSH on
    this diffuse corpus: recall@3 ≥ 0.55 (0.62 measured in the numpy
    prototype; Spark path must be in the same band)."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    exact = _topk_pairs(cosine_topk_exact(e, q, k=3))
    got = _topk_pairs(ivf_topk(e, q, k=3, n_centroids=64, nprobe=8))
    assert len(got & exact) / len(exact) >= 0.55


def test_ivf_centroid_persistence(spark, tmp_path):
    """Saved → loaded centroids give bit-identical results to the
    freshly trained index (incremental runs reuse one quantizer)."""
    import numpy as np

    from anomalydetection_spark.operators.ann import (
        load_ivf_centroids,
        save_ivf_centroids,
        train_ivf_centroids,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    cent = train_ivf_centroids(e, n_centroids=16)
    path = str(tmp_path / "ivf_index")
    save_ivf_centroids(spark, cent, path)
    loaded = load_ivf_centroids(spark, path)
    assert np.allclose(cent, loaded)
    a = sorted(map(tuple, ivf_topk(e, q, k=3, centroids=cent).collect()))
    b = sorted(map(tuple, ivf_topk(e, q, k=3, centroids=loaded).collect()))
    assert a == b


def test_ivf_deterministic(spark):
    """Sample-trained centroids are deterministic → identical results
    across invocations."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    a = ivf_topk(e, q, k=3).collect()
    b = ivf_topk(e, q, k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_ann_results_subset_of_corpus_and_ranked(spark):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 5)
    rows = ann_lsh_topk(e, q, k=3, n_tables=4).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True), qid
        assert all(r.neighbor_id != qid for r in rs)


def test_lsh_pairs_subset_of_exact(spark):
    """Every LSH candidate pair at threshold 0.8 is a true >=0.8-Jaccard
    pair (the exact re-rank guarantees no false positives)."""
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 300)
    )
    lsh = minhash_lsh_pairs(d, n_hashes=8, bands=4, threshold=0.8)
    for r in lsh.collect():
        assert r.jaccard >= 0.8


def test_ann_bucket_guard_bounds_candidates(spark):
    """max_bucket_size drops oversized candidate buckets: results are a
    subset of the unguarded run and a tight cap shrinks the output."""
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    free = _topk_pairs(ann_lsh_topk(e, q, k=3, n_tables=4, bits_per_table=4))
    capped = _topk_pairs(
        ann_lsh_topk(
            e, q, k=3, n_tables=4, bits_per_table=4, max_bucket_size=20
        )
    )
    assert len(capped) <= len(free)


def test_duplicate_clusters_components(spark):
    """Hand-built graph: {1-2, 2-3} ∪ {7-8} ∪ {4-9, 9-5, 5-4} → three
    components labeled by their min id; chain convergence needs
    multiple propagation rounds."""
    from anomalydetection_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (4, 9), (9, 5), (5, 4)],
        "a_id long, b_id long",
    )
    got = {
        r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 4: 4, 9: 4, 5: 4}


def test_duplicate_clusters_long_chain_both_paths(spark):
    """A 12-node path graph through BOTH tiers: the distributed
    propagation path (driver_threshold=0, >1 round + fixed-point stop)
    and the driver union-find must agree exactly."""
    from anomalydetection_spark.operators.dedup import duplicate_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "a_id long, b_id long"
    )
    dist = {
        r.doc_id: r.cluster_id
        for r in duplicate_clusters(pairs, driver_threshold=0).collect()
    }
    uf = {
        r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()
    }
    assert dist == uf
    assert set(dist) == set(range(100, 113))
    assert set(dist.values()) == {100}


def test_skew_guard_drops_hot_buckets(spark):
    """max_bucket_size output is a subset of the unguarded output, and a
    tight cap strictly shrinks it on a corpus with boilerplate dups."""
    d = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id") < 300)
    )
    free = {
        (r.a_id, r.b_id)
        for r in minhash_lsh_pairs(d, n_hashes=8, bands=4).collect()
    }
    capped = {
        (r.a_id, r.b_id)
        for r in minhash_lsh_pairs(
            d, n_hashes=8, bands=4, max_bucket_size=3
        ).collect()
    }
    assert capped <= free
    assert len(capped) < len(free)


def test_seed_assign_picks_nearest_and_breaks_ties_low(spark):
    """Known geometry: v0 aligns with seed 0, v1 with seed 1; an
    equidistant vector ties and must take the LOWER seed id (the
    ORDER BY cos DESC, sid ASC contract the oracle replays)."""
    from anomalydetection_spark.operators.dedup import seed_assign

    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "sid long, sv array<double>"
    )
    rows = spark.createDataFrame(
        [
            (10, [0.9, 0.1]),   # → seed 0
            (11, [0.2, 0.8]),   # → seed 1
            (12, [0.5, 0.5]),   # exact tie → seed 0
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r.vec_id: (r.seed_id, r.seed_cos)
        for r in seed_assign(rows, seeds).collect()
    }
    assert out[10][0] == 0 and out[11][0] == 1
    assert out[12][0] == 0
    assert abs(out[12][1] - 0.5**0.5) < 1e-12


def test_seed_assign_is_shuffle_free(spark):
    """Assignment must be a narrow map: broadcast seeds only, no hash
    repartitioning anywhere in the physical plan."""
    from anomalydetection_spark.operators.dedup import seed_assign

    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "sid long, sv array<double>"
    )
    rows = spark.range(100).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(7), F.rand(8)).cast("array<double>").alias(
            "embedding"
        ),
    )
    plan = (
        seed_assign(rows, seeds)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "hashpartitioning" not in plan


def test_lloyd_iteration_converges_on_separated_clusters(spark):
    """Two tight clusters, seeds started OFF-center inside each: one
    distributed Lloyd pass must pull centroids to the means and the
    next assignment must be the true partition, then a further pass
    must be a fixed point (assignments stop changing)."""
    from anomalydetection_spark.operators.ann import lloyd_iteration
    from anomalydetection_spark.operators.dedup import seed_assign

    rows = []
    for i in range(20):  # cluster A hugs +x, cluster B hugs +y
        rows.append((i, [10.0 + (i % 5) * 0.1, float(i % 3) * 0.1]))
        rows.append((100 + i, [float(i % 3) * 0.1, 10.0 + (i % 5) * 0.1]))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    seeds = spark.createDataFrame(
        [(0, [3.0, 1.0]), (1, [1.0, 3.0])], "sid long, sv array<double>"
    )

    def partition(s):
        a = seed_assign(df, s)
        return {r.vec_id: r.seed_id for r in a.collect()}

    s1 = lloyd_iteration(df, seeds)
    p1 = partition(s1)
    assert all(v == 0 for k, v in p1.items() if k < 100)
    assert all(v == 1 for k, v in p1.items() if k >= 100)
    s2 = lloyd_iteration(df, s1)
    assert partition(s2) == p1  # fixed point


def test_refine_ivf_centroids_geometry_and_empty_cells(spark):
    """Full-corpus refinement pulls centroids onto the true cluster
    means (unit-normalized), keeps ids stable, and an empty cell
    retains its previous centroid instead of vanishing."""
    import numpy as np

    from anomalydetection_spark.operators.ann import refine_ivf_centroids

    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 5) * 0.1, float(i % 3) * 0.1]))
        rows.append((100 + i, [float(i % 3) * 0.1, 10.0 + (i % 5) * 0.1]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # cell 2 points away from all data → must stay exactly as given
    cent0 = np.asarray([[0.9, 0.1], [0.1, 0.9], [-1.0, 0.0]])
    cent0 /= np.linalg.norm(cent0, axis=1, keepdims=True)
    cent = refine_ivf_centroids(df, cent0, iterations=2)
    assert cent.shape == cent0.shape
    assert np.allclose(np.linalg.norm(cent[:2], axis=1), 1.0)
    # cluster A hugs +x, cluster B hugs +y
    assert cent[0][0] > 0.95 and cent[1][1] > 0.95
    assert np.allclose(cent[2], cent0[2])


def test_refined_centroids_preserve_ivf_recall(spark):
    """One corpus-scale refinement pass must not degrade IVF recall@3
    below the sample-trained quantizer's band on sf0.1."""
    from anomalydetection_spark.operators.ann import (
        refine_ivf_centroids,
        train_ivf_centroids,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 20)
    exact = _topk_pairs(cosine_topk_exact(e, q, k=3))
    cent = train_ivf_centroids(e, n_centroids=64)
    refined = refine_ivf_centroids(e, cent, iterations=1)
    base = _topk_pairs(ivf_topk(e, q, k=3, centroids=cent))
    ref = _topk_pairs(ivf_topk(e, q, k=3, centroids=refined))
    r_base = len(base & exact) / len(exact)
    r_ref = len(ref & exact) / len(exact)
    assert r_ref >= r_base - 0.1, (r_base, r_ref)


def test_seed_assign_arrow_matches_sql_path(spark):
    """The GEMM fast path and the oracle-exact SQL fold must agree on
    every assignment (cosines to 1e-9 — numpy's pairwise summation may
    differ in the last ulp, which is why the oracle pins 'sql')."""
    from anomalydetection_spark.operators.dedup import seed_assign

    e = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    seeds = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("sid"), F.col("embedding").alias("sv")
    )
    rest = e.filter(F.col("vec_id") >= 8)
    sql = {
        r.vec_id: (r.seed_id, r.seed_cos)
        for r in seed_assign(rest, seeds, impl="sql").collect()
    }
    arrow = {
        r.vec_id: (r.seed_id, r.seed_cos)
        for r in seed_assign(rest, seeds, impl="arrow").collect()
    }
    assert set(sql) == set(arrow)
    for vid, (sid, cos) in sql.items():
        asid, acos = arrow[vid]
        assert asid == sid, vid
        assert abs(acos - cos) < 1e-9, vid


def test_seed_assign_null_embedding_both_impls(spark):
    """A NULL (or wrong-dim) vector gets NULL assignment on BOTH
    implementations — neither crashes the task nor emits an arbitrary
    struct-max winner."""
    from anomalydetection_spark.operators.dedup import seed_assign

    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "sid long, sv array<double>"
    )
    rows = spark.createDataFrame(
        [(1, [0.9, 0.1]), (2, None), (3, [1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    for impl in ("sql", "arrow"):
        out = {
            r.vec_id: (r.seed_id, r.seed_cos)
            for r in seed_assign(rows, seeds, impl=impl).collect()
        }
        assert out[1][0] == 0, impl
        assert out[2] == (None, None), impl
        # wrong dim: NULL on both paths (arrow via the GEMM dim check,
        # sql via the _best.cos IS NULL gate — zip_with pads the short
        # side with NULLs, so cos is NULL against every seed)
        assert out[3] == (None, None), impl


def test_seed_assign_zero_norm_vector_both_impls(spark):
    """An all-zeros embedding (cos undefined) must not crash the SQL
    path with an ANSI DIVIDE_BY_ZERO, and must agree with the arrow
    path: norms floored at 1e-300 give cos 0.0, so the lowest seed id
    wins deterministically on both."""
    from anomalydetection_spark.operators.dedup import seed_assign

    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "sid long, sv array<double>"
    )
    rows = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [0.6, 0.8])],
        "vec_id long, embedding array<double>",
    )
    for impl in ("sql", "arrow"):
        out = {
            r.vec_id: (r.seed_id, r.seed_cos)
            for r in seed_assign(rows, seeds, impl=impl).collect()
        }
        assert out[1][0] == 0 and abs(out[1][1]) < 1e-12, impl
        assert out[2][0] == 1, impl


def test_simhash_pairs_pigeonhole_recall(spark):
    """bands = max_hamming + 1 guarantees recall 1.0: simhash_pairs
    output must equal the brute-force all-pairs set at the same
    Hamming threshold (no bucketing miss), including a planted
    near-identical pair."""
    from anomalydetection_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i} end")
        for i in range(20)
    ]
    rows.append((100, "alpha beta gamma delta epsilon zeta token1 end "
                      "extra"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(docs, bits=32, max_hamming=3).collect()
    }
    fps = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(docs, bits=32).collect()
    }
    ids = sorted(fps)
    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == brute
    assert any(100 in (a, b) for a, b, _ in got)  # planted near-dup found


def test_simhash_pairs_query_config_recall(spark):
    """The catalog config (bits=60, 4 bands -> 15-bit keys, max_bucket_
    size=50): planted near-dups within the Hamming threshold are all
    recovered (recall 1.0) when no band bucket exceeds the cap — the
    pigeonhole guarantee survives the skew guard on a non-skewed
    corpus."""
    from anomalydetection_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_pairs,
    )

    rows = [
        (i, f"alpha beta gamma delta epsilon zeta token{i} tail{i % 7}")
        for i in range(30)
    ]
    # planted near-dups of docs 1 and 2: reordered + repeated tokens
    # (identical DISTINCT token set -> identical fingerprint -> hamming
    # 0, guaranteed within any threshold; at 60 bits a single extra
    # token on a short doc flips ~sqrt-n-scaled bit counts, so a
    # token-edit plant would not be deterministically <= 3)
    rows.append((101, "tail1 token1 zeta epsilon delta gamma beta "
                      "alpha alpha beta"))
    rows.append((102, "tail2 token2 zeta epsilon delta gamma beta "
                      "alpha token2 zeta"))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {
        (r.a_id, r.b_id, r.hamming)
        for r in simhash_pairs(
            docs, bits=60, max_hamming=3, max_bucket_size=50
        ).collect()
    }
    fps = {
        r.doc_id: r.simhash
        for r in simhash_fingerprints(docs, bits=60).collect()
    }
    ids = sorted(fps)
    brute = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    assert got == brute  # recall 1.0 vs brute force at the threshold
    assert any({a, b} == {1, 101} for a, b, _ in got)
    assert any({a, b} == {2, 102} for a, b, _ in got)


def test_simhash_pairs_skew_guard_and_validation(spark):
    import pytest

    from anomalydetection_spark.operators.dedup import simhash_pairs

    docs = spark.createDataFrame(
        [(i, "same exact text every row") for i in range(10)],
        "doc_id bigint, text string",
    )
    # identical docs -> every band bucket holds all 10; guard drops them
    assert simhash_pairs(docs, max_bucket_size=5).count() == 0
    assert simhash_pairs(docs).count() == 45
    with pytest.raises(ValueError, match="bands must divide"):
        simhash_pairs(docs, bits=32, bands=5)


def test_containment_pairs_short_doc_inside_long(spark):
    """A short doc fully embedded in a long one: containment 1.0 while
    Jaccard is far below any dedup threshold — direction normalized to
    (contained, container)."""
    from anomalydetection_spark.operators.dedup import containment_pairs

    long_text = " ".join(f"w{i}" for i in range(40))
    short_text = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame(
        [(1, long_text), (2, short_text), (3, short_text)],
        "doc_id bigint, text string",
    )
    out = {
        (r.contained_id, r.container_id): (r.containment, r.jaccard)
        for r in containment_pairs(docs, threshold=0.9).collect()
    }
    # 2 and 3 are identical (ties -> lower id contained); both sit
    # inside 1. LSH bands on 8-slot signatures: identical docs always
    # collide; (short, long) collides when shared tokens dominate the
    # min-hash slots — assert on the pairs that MUST be present.
    assert out[(2, 3)] == (1.0, 1.0)
    for k in ((2, 1), (3, 1)):
        if k in out:
            c, j = out[k]
            assert c == 1.0 and j == round(8 / 40, 4)


def test_lloyd_iteration_skips_unassignable_vectors(spark):
    """Wrong-dim / NULL vectors (seed_id NULL from seed_assign) must
    not produce a sid=NULL centroid row or crash refine_ivf_centroids
    with int(None)."""
    from anomalydetection_spark.operators.ann import (
        lloyd_iteration,
        refine_ivf_centroids,
    )

    seeds = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "sid long, sv array<double>"
    )
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 0.0, 5.0]),
         (4, None)],
        "vec_id long, embedding array<double>",
    )
    out = lloyd_iteration(vecs, seeds)
    sids = [r.sid for r in out.collect()]
    assert sorted(sids) == [0, 1]
    cent = refine_ivf_centroids(vecs, [[1.0, 0.0], [0.0, 1.0]])
    assert cent.shape == (2, 2)


def test_dedup_split_containment_tier(spark, tmp_path):
    """containment_threshold: a short doc embedded verbatim in a long
    one (Jaccard far below 0.8) is dropped by the containment tier, the
    container survives, and the Jaccard-cluster tier still works."""
    import pyspark.sql.functions as F

    from anomalydetection_spark.operators.dedup import write_dedup_split

    # containment recall follows the LSH S-curve on JACCARD, so an
    # extreme size ratio needs the documented mitigation: 1-row bands
    # (bands == n_hashes). 4 shared / 8 extra tokens at bands=8 is a
    # deterministic collision for this fixed data.
    short = "alpha beta gamma delta"
    long_ = short + " " + " ".join(f"w{i}" for i in range(8))
    rows = [
        (1, long_),
        (2, short),                 # contained in 1, low Jaccard
        (3, "unrelated text about sparks and shuffles"),
        (4, "unrelated text about sparks and shuffles"),  # exact dup of 3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = write_dedup_split(
        docs, str(tmp_path / "split"),
        containment_threshold=0.9, bands=8,
    )
    kept = spark.read.parquet(out["kept"])
    kept_ids = {r["doc_id"] for r in kept.collect()}
    assert kept_ids == {1, 3}
    assert out["n_contained"] == 1
    assert out["n_duplicates"] == 2  # doc 2 (contained) + doc 4 (cluster)
    # without the tier, the contained doc survives
    out2 = write_dedup_split(docs, str(tmp_path / "split2"), bands=8)
    kept2 = {r["doc_id"] for r in spark.read.parquet(out2["kept"]).collect()}
    assert kept2 == {1, 2, 3}
    assert "n_contained" not in out2


def test_select_survivors_quality_argmax(spark):
    """keep='quality': survivor is the cluster member with the highest
    score; ties break to min id (string ids supported); docs missing a
    quality row rank lowest; keep='min_id' stays the contract default."""
    import pyspark.sql.functions as F
    import pytest

    from anomalydetection_spark.operators.dedup import select_survivors

    clusters = spark.createDataFrame(
        [("a1", "a1"), ("a2", "a1"), ("a3", "a1"),
         ("b1", "b1"), ("b2", "b1"),
         ("c1", "c1"), ("c2", "c1")],
        "doc_id string, cluster_id string",
    )
    quality = spark.createDataFrame(
        [("a1", 1.0), ("a2", 9.0), ("a3", 9.0),   # tie a2/a3 -> a2
         ("b1", 5.0),                              # b2 missing -> -inf
         ("c2", 0.0)],                             # c1 missing
        "doc_id string, quality_score double",
    )
    surv = {
        r["cluster_id"]: r["survivor_id"]
        for r in select_survivors(clusters, "quality", quality).collect()
    }
    assert surv == {"a1": "a2", "b1": "b1", "c1": "c2"}

    minid = {
        r["cluster_id"]: r["survivor_id"]
        for r in select_survivors(clusters).collect()
    }
    assert minid == {"a1": "a1", "b1": "b1", "c1": "c1"}

    with pytest.raises(ValueError, match="requires a quality"):
        select_survivors(clusters, "quality", None)
    with pytest.raises(ValueError, match="keep must be"):
        select_survivors(clusters, "best")


def test_dedup_split_keeps_best_quality_copy(spark, tmp_path):
    """write_dedup_split(keep='quality'): the planted near-dup's
    HIGHER-quality copy survives even though it has the larger id (the
    min-id policy would have dropped it)."""
    from anomalydetection_spark.operators.dedup import write_dedup_split

    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base),                      # lower quality copy, min id
        (2, base),                      # higher quality copy
        (3, "unrelated text about sparks and shuffles"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    quality = spark.createDataFrame(
        [(1, 2.0), (2, 7.0), (3, 5.0)],
        "doc_id long, quality_score double",
    )
    out = write_dedup_split(
        docs, str(tmp_path / "split"),
        keep="quality", quality=quality,
    )
    kept = {r["doc_id"] for r in spark.read.parquet(out["kept"]).collect()}
    assert kept == {2, 3}
    assert out["n_duplicates"] == 1
    # default policy keeps the min id instead
    out2 = write_dedup_split(docs, str(tmp_path / "split2"))
    kept2 = {r["doc_id"] for r in spark.read.parquet(out2["kept"]).collect()}
    assert kept2 == {1, 3}


def test_centroid_outliers_flags_planted_vector(spark):
    """centroid_outliers: a vector planted far from its label's tight
    cluster is flagged rank 1; the clean cluster and a two-member
    degenerate group produce no flags."""
    import math

    from anomalydetection_spark.operators.ann import centroid_outliers

    rows = []
    # label 0: tight ring around (1, 0, ...) + one far-away plant.
    # Cluster distances must VARY (a constant-radius ring makes the
    # pre-plant stddev ~0 and the z of every point explode).
    for i in range(20):
        rows.append(
            (i, [1.0 + 0.01 * math.cos(i), 0.01 * math.sin(i) * (i % 3),
                 0.001 * i, 0.0], 0)
        )
    rows.append((99, [50.0, 50.0, 50.0, 50.0], 0))  # the plant
    # label 1: two identical vectors -> sd of distances 0 -> no flags
    rows.append((200, [0.5, 0.5, 0.0, 0.0], 1))
    rows.append((201, [0.5, 0.5, 0.0, 0.0], 1))
    # null rows ignored
    rows.append((300, None, 0))
    rows.append((301, [1.0, 0.0, 0.0, 0.0], None))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = centroid_outliers(emb, z_k=2.0).collect()
    assert [(r.label, r.vec_id, r.rank) for r in out] == [(0, 99, 1)]
    assert out[0].z > 2.0
    assert out[0].dist > 50.0  # far from the (≈1,0,0,0)-ish centroid
