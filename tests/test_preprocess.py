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
