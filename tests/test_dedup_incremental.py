"""Incremental dedup index (operators/dedup_incremental.py):
delta updates equal one-shot batch dedup, cluster bridges relabel
stored state, replay and concurrent commits are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.dedup import (
    duplicate_clusters,
    minhash_lsh_pairs,
)
from anomalydetection_spark.operators.dedup_incremental import DedupIndex


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


X = " ".join(f"tok{i}" for i in range(20))           # cluster-X text
Y = " ".join(f"other{i}" for i in range(20))          # cluster-Y text


def test_new_batch_joins_existing_cluster(spark, tmp_path):
    idx = DedupIndex(str(tmp_path / "idx"))
    v = idx.build(_docs(spark, [(1, X), (2, X), (10, Y)]))
    assert v == 1
    res = idx.update(_docs(spark, [(20, X), (21, "unrelated words entirely")]))
    assert res["version"] == 2 and res["merges"] == []
    out = {r.doc_id: (r.cluster_id, r.is_duplicate)
           for r in res["assignments"].collect()}
    assert out[20] == (1, True)      # joins the {1,2} cluster
    assert out[21] == (21, False)    # unique
    state = {r.doc_id: r.cluster_id
             for r in idx.assignments(spark).collect()}
    assert state == {1: 1, 2: 1, 10: 10, 20: 1, 21: 21}


def test_bridge_doc_merges_two_stored_clusters(spark, tmp_path):
    """A new doc similar to BOTH stored clusters merges them: the
    absorbed cluster's stored assignments relabel to the surviving
    min id, and the merge is reported."""
    # Jaccard(bridge, X') = Jaccard(bridge, Y') = 20/24 ≈ 0.833 ≥ 0.8
    # while Jaccard(X', Y') = 16/24 ≈ 0.667 < 0.8
    shared = [f"s{i}" for i in range(16)]
    xp = " ".join(shared + [f"xa{i}" for i in range(4)])
    yp = " ".join(shared + [f"yb{i}" for i in range(4)])
    bridge = " ".join(
        shared + [f"xa{i}" for i in range(4)] + [f"yb{i}" for i in range(4)]
    )
    idx = DedupIndex(str(tmp_path / "idx"))
    idx.build(_docs(spark, [(1, xp), (2, xp), (10, yp), (11, yp)]))
    base = {r.doc_id: r.cluster_id
            for r in idx.assignments(spark).collect()}
    assert base == {1: 1, 2: 1, 10: 10, 11: 10}  # two distinct clusters

    res = idx.update(_docs(spark, [(20, bridge)]))
    assert res["merges"] == [(10, 1)]
    out = {r.doc_id: (r.cluster_id, r.is_duplicate)
           for r in res["assignments"].collect()}
    assert out[20] == (1, True)
    state = {r.doc_id: r.cluster_id
             for r in idx.assignments(spark).collect()}
    # the absorbed {10, 11} cluster relabeled to the union's min id
    assert state == {1: 1, 2: 1, 10: 1, 11: 1, 20: 1}


def test_incremental_equals_batch_on_corpus(spark, tmp_path):
    """build(batch₁) ∘ update(batch₂) == one-shot batch LSH+CC over
    the union, label for label (the sf0.01 tier of this claim is the
    hash-exact dedup_increment oracle)."""
    d = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    )
    old = d.filter(F.col("doc_id") % 3 != 0)
    new = d.filter(F.col("doc_id") % 3 == 0)
    idx = DedupIndex(str(tmp_path / "idx"))
    idx.build(old)
    idx.update(new)
    state = {r.doc_id: r.cluster_id
             for r in idx.assignments(spark).collect()}

    pairs = minhash_lsh_pairs(d, "doc_id", "text")
    comp = {r.doc_id: r.cluster_id
            for r in duplicate_clusters(pairs).collect()}
    batch = {
        r.doc_id: comp.get(r.doc_id, r.doc_id)
        for r in d.select("doc_id").collect()
    }
    assert state == batch
    assert any(v != k for k, v in state.items())  # planted dups exist


def test_replay_and_preconditions_refused(spark, tmp_path):
    idx = DedupIndex(str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="build"):
        idx.update(_docs(spark, [(1, X)]))
    with pytest.raises(ValueError, match="empty"):
        idx.assignments(spark)
    idx.build(_docs(spark, [(1, X), (10, Y)]))
    with pytest.raises(ValueError, match="already built"):
        idx.build(_docs(spark, [(2, X)]))
    with pytest.raises(ValueError, match="replay"):
        idx.update(_docs(spark, [(1, X), (30, Y)]))


def test_concurrent_commit_detected(spark, tmp_path):
    idx = DedupIndex(str(tmp_path / "idx"))
    idx.build(_docs(spark, [(1, X)]))
    idx.update(_docs(spark, [(20, Y)]))  # CURRENT is now v2
    # a commit computed against v1 must fail loudly
    docs = spark.read.parquet(idx._docs_path(2))
    bands = spark.read.parquet(idx._bands_path(2))
    with pytest.raises(RuntimeError, match="concurrent"):
        idx._commit(docs, bands, "stale", expected_base=1)


def test_hot_bucket_guard_spans_old_and_new(spark, tmp_path):
    """A bucket cold in the batch but hot across history+batch is
    dropped by the union-counted guard: the boilerplate doc pairs with
    nothing even though its batch-local bucket population is 1."""
    boiler = "same exact text every single row here now"
    idx = DedupIndex(str(tmp_path / "idx"), max_bucket_size=5)
    idx.build(_docs(spark, [(i, boiler) for i in range(10)]))
    # the 10 identical docs exceed the guard at build time: no pairs
    assert all(
        r.cluster_id == r.doc_id
        for r in idx.assignments(spark).collect()
    )
    res = idx.update(_docs(spark, [(100, boiler)]))
    out = res["assignments"].collect()
    assert len(out) == 1 and out[0].is_duplicate is False


def test_dedup_index_cli_build_then_update(spark, docs_path, tmp_path):
    """--dedup-index round-trip over the interleaved fixture corpus:
    run 1 builds the state, run 2 dedups a disjoint batch against it
    and writes the batch assignments; both summaries stamp into the
    manifest."""
    import json

    from anomalydetection_spark.run import dedup_index_round, parse_args
    from anomalydetection_spark.sources.manifest import Manifest

    d = spark.read.parquet(docs_path)
    p_old = str(tmp_path / "old")
    p_new = str(tmp_path / "new")
    d.filter(F.crc32(F.col("doc_id")) % 4 != 0).write.parquet(p_old)
    d.filter(F.crc32(F.col("doc_id")) % 4 == 0).write.parquet(p_new)

    out = str(tmp_path / "out")
    mdir = str(tmp_path / "manifest")
    s1 = dedup_index_round(
        spark,
        parse_args(["--docs", p_old, "--out", out,
                    "--manifest-dir", mdir, "--dedup-index"]),
        "b1",
    )
    json.dumps(s1)
    assert s1["mode"] == "build" and s1["state_version"] == 1
    # the fixture plants duplicate doc_ids (uniqueness violations);
    # the index keys one row per id
    assert s1["n_indexed"] == (
        spark.read.parquet(p_old).select("doc_id").distinct().count()
    )

    s2 = dedup_index_round(
        spark,
        parse_args(["--docs", p_new, "--out", out,
                    "--manifest-dir", mdir, "--dedup-index"]),
        "b2",
    )
    json.dumps(s2)
    assert s2["mode"] == "update" and s2["state_version"] == 2
    assert s2["n_batch"] == (
        spark.read.parquet(p_new).select("doc_id").distinct().count()
    )
    a = spark.read.parquet(s2["assignments"])
    assert set(a.columns) == {"doc_id", "cluster_id", "is_duplicate"}
    st = Manifest(mdir).get_stats("dedup_index")
    assert st is not None and st["mode"] == "update"


def test_config_mismatch_refused(spark, tmp_path):
    """Reopening the index with different LSH parameters is refused —
    stored band keys are not comparable across configs."""
    path = str(tmp_path / "idx")
    DedupIndex(path).build(_docs(spark, [(1, X)]))
    bad = DedupIndex(path, n_hashes=8, bands=2)
    with pytest.raises(ValueError, match="not comparable"):
        bad.update(_docs(spark, [(2, Y)]))
