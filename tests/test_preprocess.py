"""Training-data preprocessing funnel (plans/preprocess.py): each
stage drops exactly its planted docs, attrition accounting is exact,
and the kept corpus carries full original rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.plans.preprocess import run_preprocess


def _corpus(spark):
    rows = []
    for i in range(30):
        toks = ["the", "of"] + [
            f"item{i}w{j} " .strip() for j in range(22)
        ]
        rows.append((i, " ".join(toks)))
    # quality-bad: too short
    rows.append((900, "too short of the"))
    rows.append((901, "also short of the"))
    # near-dup copies of doc 0 (exact text, higher ids)
    for k in range(3):
        rows.append((1000 + k, rows[0][1]))
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_funnel_stages_drop_planted_docs(spark):
    docs = _corpus(spark)
    bench = docs.filter(F.col("doc_id") == 1).select("text")
    res = run_preprocess(
        spark, docs, id_col="doc_id", text_col="text", benchmark=bench
    )
    stages = {s["stage"]: s for s in res.funnel}
    assert list(stages) == ["quality", "dedup", "decontaminate"]
    assert stages["quality"]["n_in"] == 35
    assert stages["quality"]["n_dropped"] == 2          # the two shorts
    assert stages["dedup"]["n_dropped"] == 3            # the three copies
    assert stages["decontaminate"]["n_dropped"] == 1    # benchmark doc
    assert stages["decontaminate"]["n_out"] == 29
    kept = {r.doc_id for r in res.kept.select("doc_id").collect()}
    assert 0 in kept            # cluster survivor (min id)
    assert 1 not in kept        # decontaminated
    assert not kept & {900, 901, 1000, 1001, 1002}
    # funnel conservation: n_out of stage k == n_in of stage k+1
    f = res.funnel
    for a, b in zip(f, f[1:]):
        assert a["n_out"] == b["n_in"]
        assert a["n_in"] - a["n_dropped"] == a["n_out"]


def test_funnel_optional_stages(spark):
    docs = _corpus(spark)
    res = run_preprocess(
        spark, docs, quality=False, dedup=True, benchmark=None
    )
    assert [s["stage"] for s in res.funnel] == ["dedup"]
    # the quality-bad docs remain (stage off); only dup copies drop
    assert res.funnel[0]["n_dropped"] == 3
    assert res.funnel[0]["n_out"] == 32


def test_preprocess_cli_round(spark, docs_path, tmp_path):
    """--preprocess plumbing: runs over the interleaved fixture corpus
    (text via spans), writes the kept table, stamps the funnel into
    the manifest, summary is JSON-serializable."""
    import json

    from anomalydetection_spark.run import parse_args, preprocess_round
    from anomalydetection_spark.sources.manifest import Manifest

    out = str(tmp_path / "out")
    mdir = str(tmp_path / "manifest")
    args = parse_args(
        ["--docs", docs_path, "--out", out, "--manifest-dir", mdir,
         "--preprocess"]
    )
    s = preprocess_round(spark, args, "p1")
    json.dumps(s)
    assert [st["stage"] for st in s["funnel"]] == ["quality", "dedup"]
    for st in s["funnel"]:
        assert st["n_in"] - st["n_dropped"] == st["n_out"]
    kept = spark.read.parquet(s["kept"])
    assert kept.count() == s["n_kept"]
    assert set(kept.columns) >= {"doc_id", "spans", "partition_id"}
    st = Manifest(mdir).get_stats("preprocess_funnel")
    assert st is not None and st["stages"] == s["funnel"]


def test_preprocess_chunk_pack_end_to_end(spark, tmp_path):
    """--preprocess --chunk-tokens --pack-budget: the funnel's kept
    docs are chunked and greedily packed; budget conservation holds on
    the packed output (every pack <= budget unless it is a single
    oversized chunk; token totals and chunk counts conserved; every
    chunk in exactly one pack; packs never span shards)."""
    import json

    from anomalydetection_spark.run import parse_args, preprocess_round

    # natural-ish corpus that SURVIVES the quality stage (docs of
    # ~20-100 distinct-ish tokens with stopwords), plus planted
    # near-dup copies the dedup stage removes
    rows = []
    for i in range(40):
        toks = ["the", "of", "and"] + [
            f"w{i}x{j}" for j in range(20 + (i * 7) % 80)
        ]
        rows.append((i, " ".join(toks)))
    for k in range(3):
        rows.append((2000 + k, rows[0][1]))
    docs_pq = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, "doc_id bigint, text string"
    ).write.parquet(docs_pq)

    out = str(tmp_path / "out")
    args = parse_args(
        ["--docs", docs_pq, "--out", out, "--preprocess",
         "--chunk-tokens", "32", "--pack-budget", "128",
         "--pack-shards", "8"]
    )
    s = preprocess_round(spark, args, "p1")
    json.dumps(s)
    assert s["n_kept"] == 40  # dup copies dropped, originals kept
    assert s["packing"]["budget"] == 128 and s["packing"]["shards"] == 8
    packed = spark.read.parquet(s["packed"])
    assert set(packed.columns) >= {
        "doc_id", "chunk_idx", "chunk_text", "n_tokens", "shard", "pack_id"
    }

    # chunk-count + token conservation vs an independent recount of
    # the kept corpus
    from anomalydetection_spark.operators.sample import chunk_documents

    kept = spark.read.parquet(s["kept"])
    expect = chunk_documents(kept, "doc_id", "text", chunk_tokens=32)
    assert packed.count() == expect.count() == s["packing"]["n_chunks"]
    assert packed.count() > 40  # multi-chunk docs exist
    tok_total = packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert tok_total == s["packing"]["total_tokens"]
    assert tok_total == expect.agg(F.sum("n_tokens")).collect()[0][0]

    # every chunk appears exactly once
    assert (
        packed.select("doc_id", "chunk_idx").distinct().count()
        == packed.count()
    )
    # budget: a pack over 128 tokens must be a single oversized chunk
    packs = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("n")
    )
    bad = packs.filter((F.col("tot") > 128) & (F.col("n") > 1)).count()
    assert bad == 0
    assert s["packing"]["n_packs"] == packs.count()
    assert 0 < s["packing"]["mean_fill"] <= 1.0 or (
        s["packing"]["max_pack_tokens"] > 128
    )


def test_preprocess_scrub_stage_rewrites_and_accounts(spark):
    """--scrub-ngrams stage: the shared 8-token boilerplate span is
    removed from otherwise-distinct survivors, attrition stays exact,
    and the scrub extras (n_docs_scrubbed / tokens_removed) match the
    plant."""
    boiler = "all rights reserved contact the site administrator today"
    rows = []
    for i in range(20):
        toks = ["the", "of"] + [f"item{i}w{j}" for j in range(22)]
        rows.append((i, " ".join(toks)))
    # two quality-passing docs sharing the boilerplate tail (their
    # distinct bodies keep them far below the 0.8 dedup threshold)
    rows.append((100, " ".join(["the", "of"] + [f"a{j}" for j in range(20)]) + " " + boiler))
    rows.append((101, " ".join(["the", "of"] + [f"b{j}" for j in range(20)]) + " " + boiler))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    res = run_preprocess(spark, docs, scrub_ngrams=8)
    stages = {s["stage"]: s for s in res.funnel}
    assert list(stages) == ["quality", "dedup", "scrub"]
    sc = stages["scrub"]
    assert sc["n_dropped"] == 0 and sc["n_out"] == sc["n_in"]
    assert sc["n_docs_scrubbed"] == 2
    assert sc["tokens_removed"] == 16
    kept = {r.doc_id: r.text for r in res.kept.collect()}
    assert "reserved" not in kept[100] and "reserved" not in kept[101]
    assert kept[100].endswith("a19") and kept[101].endswith("b19")
    # untouched docs keep their original bytes
    assert kept[0] == rows[0][1]


def test_preprocess_scrub_drops_fully_boilerplate_docs(spark):
    """A doc that is nothing but corpus-frequent spans scrubs to empty
    and becomes funnel attrition (dedup off so the exact copies reach
    the scrub stage)."""
    boiler = "one two three four five six seven eight"
    rows = [
        (1, " ".join(["the", "of"] + [f"c{j}" for j in range(22)])),
        (2, boiler + " " + " ".join(["the", "of"] + [f"d{j}" for j in range(14)])),
        (3, boiler),
        (4, boiler),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    res = run_preprocess(
        spark, docs, quality=False, dedup=False, scrub_ngrams=8
    )
    sc = res.funnel[0]
    assert sc["stage"] == "scrub"
    assert sc["n_dropped"] == 2          # docs 3 and 4 scrub to empty
    assert sc["n_docs_scrubbed"] == 3    # 2, 3, 4 all had the span
    kept = {r.doc_id for r in res.kept.collect()}
    assert kept == {1, 2}


def test_preprocess_cli_scrub_on_interleaved_corpus(spark, docs_path, tmp_path):
    """--scrub-ngrams over the spans table: the text accessor is
    materialized for the rewrite and SURVIVES into the kept corpus as
    `scrubbed_text` (spans keep their original bytes; dropping the
    rewrite would discard the scrub's only output)."""
    import json

    from anomalydetection_spark.run import parse_args, preprocess_round

    out = str(tmp_path / "out")
    args = parse_args(
        ["--docs", docs_path, "--out", out, "--preprocess",
         "--scrub-ngrams", "8"]
    )
    s = preprocess_round(spark, args, "p1")
    json.dumps(s)
    assert [st["stage"] for st in s["funnel"]] == [
        "quality", "dedup", "scrub"
    ]
    for st in s["funnel"]:
        assert st["n_in"] - st["n_dropped"] == st["n_out"]
    kept = spark.read.parquet(s["kept"])
    assert "_pp_text" not in kept.columns
    assert "scrubbed_text" in kept.columns
    assert "spans" in kept.columns
    # the scrub's rewrite is materialized: no kept row may carry an
    # N-token window that >=2 distinct docs shared
    assert kept.filter(F.col("scrubbed_text").isNull()).count() == 0
    assert kept.count() == s["n_kept"]


def test_assign_folds_group_integrity_and_balance(spark):
    from anomalydetection_spark.operators.sample import assign_folds
    from pyspark.sql import functions as F

    rows = [(i, f"g{i % 40}") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, grp string")
    out = assign_folds(df, "id", k=5, group_col="grp")
    # every group lands wholly in one fold
    per_grp = out.groupBy("grp").agg(
        F.countDistinct("fold").alias("nf")
    ).collect()
    assert all(r["nf"] == 1 for r in per_grp)
    # all folds populated, deterministic across calls
    sizes = {r["fold"]: r["c"] for r in out.groupBy("fold").agg(F.count("*").alias("c")).collect()}
    assert set(sizes) == {0, 1, 2, 3, 4}
    again = assign_folds(df, "id", k=5, group_col="grp")
    assert out.collect() == again.collect()
    # different salt reshuffles at least one group
    other = assign_folds(df, "id", k=5, group_col="grp", salt="v2")
    joined = out.alias("a").join(other.alias("b"), "id").filter(
        F.col("a.fold") != F.col("b.fold")
    )
    assert joined.count() > 0


def test_assign_folds_rowwise_without_group(spark):
    from anomalydetection_spark.operators.sample import assign_folds

    df = spark.createDataFrame([(i,) for i in range(100)], "id long")
    out = assign_folds(df, "id", k=3)
    assert out.select("fold").distinct().count() == 3
