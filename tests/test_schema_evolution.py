"""Schema-evolution compatibility (operators/schema_evolution.py):
Iceberg-rule judgments over two schema versions, nested paths
included, plus the snapshot-diff CLI ride-along."""

from __future__ import annotations

from pyspark.sql import types as T

from anomalydetection_spark.operators.schema_evolution import (
    CONSUMER_BREAK,
    OK,
    READER_BREAK,
    schema_compat,
    schema_compat_df,
)


def _s(ddl: str) -> T.StructType:
    return T.StructType.fromDDL(ddl)


def test_identical_schemas_are_silent(spark):
    s = _s("a int, b string")
    assert schema_compat(s, s) == []


def test_add_drop_and_nullability():
    old = T.StructType(
        [
            T.StructField("keep", T.IntegerType()),
            T.StructField("gone", T.StringType()),
            T.StructField("tighten", T.StringType(), nullable=True),
            T.StructField("loosen", T.StringType(), nullable=False),
        ]
    )
    new = T.StructType(
        [
            T.StructField("keep", T.IntegerType()),
            T.StructField("tighten", T.StringType(), nullable=False),
            T.StructField("loosen", T.StringType(), nullable=True),
            T.StructField("opt_new", T.StringType(), nullable=True),
            T.StructField("req_new", T.StringType(), nullable=False),
        ]
    )
    got = {(r["path"], r["change"]): r["compat"]
           for r in schema_compat(old, new)}
    assert got == {
        ("gone", "drop"): CONSUMER_BREAK,
        ("tighten", "required"): READER_BREAK,
        ("loosen", "optional"): OK,
        ("opt_new", "add"): OK,
        ("req_new", "add"): READER_BREAK,
    }


def test_type_widening_vs_narrowing(spark):
    old = _s("a int, b float, c long, d decimal(10,2), e decimal(10,2),"
             " f date")
    new = _s("a long, b double, c int, d decimal(14,2), e decimal(14,4),"
             " f timestamp")
    got = {r["path"]: (r["change"], r["compat"])
           for r in schema_compat(old, new)}
    assert got["a"] == ("widen", OK)
    assert got["b"] == ("widen", OK)
    assert got["c"] == ("type", READER_BREAK)       # long→int narrows
    assert got["d"] == ("widen", OK)                # precision up
    assert got["e"] == ("type", READER_BREAK)       # scale changed
    assert got["f"] == ("widen", OK)                # date→timestamp


def test_nested_struct_array_map_paths(spark):
    old = _s(
        "spans array<struct<kind:string,offset:int>>,"
        " props map<string,int>, meta struct<a:int,b:string>"
    )
    new = _s(
        "spans array<struct<kind:string,offset:long,extra:string>>,"
        " props map<int,long>, meta struct<a:int>"
    )
    got = {(r["path"], r["change"]): r["compat"]
           for r in schema_compat(old, new)}
    assert got[("spans.element.offset", "widen")] == OK
    assert got[("spans.element.extra", "add")] == OK
    assert got[("props.key", "type")] == READER_BREAK  # keys never widen
    assert got[("props.value", "widen")] == OK
    assert got[("meta.b", "drop")] == CONSUMER_BREAK
    # untouched leaves are silent
    assert not any(p.startswith("meta.a") for p, _ in got)
    assert ("spans.element.kind", "type") not in got


def test_compat_df_shape(spark):
    old = _s("a int")
    new = _s("a long, b string")
    df = schema_compat_df(spark, old, new)
    assert df.columns == ["path", "change", "compat", "detail"]
    assert df.count() == 2


def test_snapshot_diff_round_reports_evolution(spark, tmp_path):
    """--snapshot-diff rides schema_compat along: an added optional
    column and a widened type show up in the summary JSON."""
    import json

    from anomalydetection_spark.run import parse_args, snapshot_diff_round

    prev = spark.createDataFrame(
        [(1, 10), (2, 20)], "doc_id long, v int"
    )
    cur = spark.createDataFrame(
        [(1, 10, "x"), (2, 21, "y")], "doc_id long, v long, note string"
    )
    p_prev, p_cur = str(tmp_path / "prev"), str(tmp_path / "cur")
    prev.write.parquet(p_prev)
    cur.write.parquet(p_cur)
    args = parse_args(
        [
            "--docs", p_cur,
            "--out", str(tmp_path / "out"),
            "--snapshot-diff", p_prev,
            "--diff-key", "doc_id",
            "--diff-compare", "v",
        ]
    )
    summary = snapshot_diff_round(spark, args, "r1")
    json.dumps(summary)
    evo = {(r["path"], r["change"]): r["compat"]
           for r in summary["schema_evolution"]}
    assert evo[("v", "widen")] == OK
    assert evo[("note", "add")] == OK
    assert summary["summary"]["changed"] == 1  # v: 20 → 21
