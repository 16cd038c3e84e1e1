"""Schema-contract validation (operators/contract.py): structural
diff, data-tier rule counts, verdict gating with null budgets."""

from __future__ import annotations

from anomalydetection_spark.operators.contract import (
    ColumnRule,
    Contract,
    contract_verdicts,
    contract_violation_counts,
    schema_diff,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, "a", 5.0, "ok"), (2, "b", -1.0, "ok"),
         (3, "zzz", 50.0, None), (None, "a", 2.0, "bad value")],
        "id bigint, cat string, score double, note string",
    )


CONTRACT = Contract(
    columns={
        "id": ColumnRule(dtype="bigint", nullable=False),
        "cat": ColumnRule(allowed=("a", "b")),
        "score": ColumnRule(min_value=0.0, max_value=10.0),
        "note": ColumnRule(rlike="^ok$", max_null_rate=0.5),
        "gone": ColumnRule(dtype="string"),
    },
    closed=True,
)


def test_schema_diff_structural(spark):
    issues = {(i["column"], i["issue"])
              for i in schema_diff(_df(spark).schema, CONTRACT)}
    assert ("gone", "missing_column") in issues
    assert ("id", "nullable_mismatch") in issues  # parquet-style nullable
    # closed contract: no extras here (all 4 declared)
    assert not any(i == "unexpected_column" for _, i in issues)

    open_extra = Contract(columns={"id": ColumnRule()}, closed=True)
    issues2 = {(i["column"], i["issue"])
               for i in schema_diff(_df(spark).schema, open_extra)}
    assert ("cat", "unexpected_column") in issues2


def test_violation_counts_one_pass(spark):
    counts = {
        (r.column, r.rule): (r.n_violations, r.violation_rate)
        for r in contract_violation_counts(_df(spark), CONTRACT).collect()
    }
    assert counts[("id", "null")][0] == 1
    assert counts[("cat", "allowed")][0] == 1          # zzz
    assert counts[("score", "min_value")][0] == 1      # -1.0
    assert counts[("score", "max_value")][0] == 1      # 50.0
    assert counts[("note", "rlike")][0] == 1           # "bad value"
    assert counts[("note", "null")][0] == 1            # null within budget


def test_verdicts_null_budget(spark):
    v = {
        (r.check, r.column): r.verdict
        for r in contract_verdicts(_df(spark), CONTRACT).collect()
    }
    assert v[("rule:null", "id")] == "fail"       # nullable=False, 1 null
    assert v[("rule:null", "note")] == "pass"     # 25% <= 50% budget
    assert v[("rule:allowed", "cat")] == "fail"
    assert v[("schema:missing_column", "gone")] == "fail"


def test_pipeline_contract_integration(spark, docs, catalog):
    """run_validation(contract=...) unions table-level contract verdict
    rows (check = '<tier>:<rule>:<column>', partition_id null) without
    disturbing the per-partition checks."""
    from anomalydetection_spark.plans.pipeline import run_validation

    contract = Contract(
        columns={
            "doc_id": ColumnRule(dtype="string", max_null_rate=0.0),
            "spans": ColumnRule(max_null_rate=0.5),
            "nonexistent": ColumnRule(),
        }
    )
    res = run_validation(spark, docs, catalog=catalog, contract=contract)
    rows = {r.check: r.verdict for r in res.verdicts.collect()}
    assert rows["schema:missing_column:nonexistent"] == "fail"
    assert "rule:null:doc_id" in rows
    assert "rule:null:spans" in rows
    # per-partition checks unaffected
    assert any(k == "uniqueness" for k in rows)


def test_dtype_only_contract_structural_only(spark):
    """A contract with only structural expectations (dtype-only
    columns, no data rules) must not crash the agg pass with
    stack(0, ) — counts come back empty-typed and verdicts carry the
    structural rows alone."""
    from anomalydetection_spark.operators.contract import (
        ColumnRule,
        Contract,
        contract_verdicts,
        contract_violation_counts,
    )

    df = spark.createDataFrame([(1, "a")], "id bigint, name string")
    ok = Contract(columns={
        "id": ColumnRule(dtype="bigint"),
        "name": ColumnRule(dtype="string"),
    })
    cnt = contract_violation_counts(df, ok)
    assert cnt.columns == [
        "column", "rule", "n_violations", "violation_rate"
    ]
    assert cnt.count() == 0
    assert contract_verdicts(df, ok).count() == 0

    bad = Contract(columns={"id": ColumnRule(dtype="string")})
    rows = contract_verdicts(df, bad).collect()
    assert len(rows) == 1
    assert rows[0].check.startswith("schema:")
    assert rows[0].verdict == "fail"


def test_element_rules_nested_spans(spark):
    """Per-element rules over array<struct> (the engine's own spans
    payload): counted per element in the same single agg pass, rate
    denominator = total elements (NULL arrays contribute 0); budget /
    strict verdict branches and invalid-path structural fallback all
    pinned."""
    from anomalydetection_spark.operators.contract import (
        contract_from_dict,
        contract_verdicts,
    )

    df = spark.createDataFrame(
        [
            (1, [("text", "hi", 0), ("image", None, 5)]),
            (2, [("bogus", None, -1)]),
            (3, None),
            (4, []),
        ],
        "id bigint,"
        " spans array<struct<kind string, text string, offset int>>",
    )
    c = contract_from_dict({
        "elements": {
            "spans.kind": {
                "allowed": ["text", "image", "audio", "video"],
            },
            # 2 of 3 elements have null text -> 0.667 > 0.5 budget
            "spans.text": {"max_null_rate": 0.5},
            # offsets must be >= 0; one planted -1
            "spans.offset": {"min_value": 0},
            # invalid paths -> structural failures, not crashes
            "spans.nope": {"max_null_rate": 0},
            "id.x": {"max_null_rate": 0},
        },
    })
    rows = {
        (r.check, r.column): r
        for r in contract_verdicts(df, c).collect()
    }
    allowed = rows[("rule:allowed", "spans[*].kind")]
    assert allowed.n_violations == 1
    assert abs(allowed.violation_rate - round(1 / 3, 6)) < 1e-9
    assert allowed.verdict == "fail"
    nulls = rows[("rule:null", "spans[*].text")]
    assert nulls.n_violations == 2 and nulls.verdict == "fail"
    off = rows[("rule:min_value", "spans[*].offset")]
    assert off.n_violations == 1 and off.verdict == "fail"
    assert rows[("schema:invalid_element_rule", "spans.nope")].verdict == "fail"
    assert rows[("schema:invalid_element_rule", "id.x")].verdict == "fail"

    # budget pass branch: raise the text budget above the observed rate
    c2 = contract_from_dict(
        {"elements": {"spans.text": {"max_null_rate": 0.7}}}
    )
    r2 = {
        (r.check, r.column): r for r in contract_verdicts(df, c2).collect()
    }
    assert r2[("rule:null", "spans[*].text")].verdict == "pass"


def test_element_rules_zero_element_denominator(spark):
    """Element rules over a table whose ruled arrays are ALL empty or
    NULL: the rate denominator is 0 — verdicts must come back (rate
    NULL, 0 violations, pass) instead of an ANSI DIVIDE_BY_ZERO crash."""
    from anomalydetection_spark.operators.contract import (
        contract_from_dict,
        contract_verdicts,
    )

    df = spark.createDataFrame(
        [(1, []), (2, None)],
        "id bigint,"
        " spans array<struct<kind string, text string, offset int>>",
    )
    c = contract_from_dict(
        {"elements": {"spans.kind": {"max_null_rate": 0.1}}}
    )
    rows = {
        (r.check, r.column): r
        for r in contract_verdicts(df, c).collect()
    }
    r = rows[("rule:null", "spans[*].kind")]
    assert r.n_violations == 0
    assert r.violation_rate is None
    assert r.verdict == "pass"


def test_element_rule_non_dict_body_raises(spark):
    """A config typo like {'spans.kind': ['text']} (list where a dict
    of rule fields belongs) must fail loudly, not silently compile an
    ElementRule that validates nothing."""
    import pytest

    from anomalydetection_spark.operators.contract import (
        contract_from_dict,
    )

    with pytest.raises(ValueError, match="spans.kind"):
        contract_from_dict({"elements": {"spans.kind": ["text"]}})


def test_expression_rules_cross_column(spark):
    """Named cross-column SQL rules compile into the same single agg
    pass: violations = rows where the expr is false OR null; budget
    semantics match the null rule; an unparseable expr becomes a
    structural failure instead of crashing."""
    from anomalydetection_spark.operators.contract import (
        Contract,
        ExpressionRule,
        contract_verdicts,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 2), (4, None), (5, 50)],
        "a bigint, b bigint",
    )
    c = Contract(expressions={
        "b_geq_a": ExpressionRule("b >= a"),                 # 3:2 fails, null fails
        "b_mostly": ExpressionRule("b >= a", max_violation_rate=0.5),
        "bad": ExpressionRule("nosuchcol > 1"),
    })
    rows = {r.check + "/" + r.column: r for r in contract_verdicts(df, c).collect()}
    strict = rows["rule:expr:b_geq_a/*"]
    assert strict.n_violations == 2            # (3,2) and (4,null)
    assert strict.verdict == "fail"
    budget = rows["rule:expr:b_mostly/*"]
    assert budget.n_violations == 2 and budget.verdict == "pass"  # 0.4 <= 0.5
    invalid = rows["schema:invalid_expression/bad"]
    assert invalid.verdict == "fail" and invalid.detail


def test_example_contract_config_parses_and_runs(spark):
    """examples/contract.json (the README's documented surface) parses
    through the same path as --config and validates the fixture docs
    schema without structural failures on the declared columns."""
    import json
    import os

    from anomalydetection_spark.config import config_from_dict
    from anomalydetection_spark.operators.contract import (
        contract_from_dict,
        contract_verdicts,
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "contract.json",
    )
    with open(path) as f:
        d = json.load(f)
    config_from_dict(d["validation"])  # must not raise
    c = contract_from_dict(d["contract"])
    assert set(c.elements) == {"spans.kind", "spans.offset", "spans.text"}
    df = spark.createDataFrame(
        [("d1", [("text", "hello", None, 0)], 0)],
        "doc_id string,"
        " spans array<struct<kind string, text string,"
        " media_ref string, offset int>>, partition_id int",
    )
    rows = contract_verdicts(df, c).collect()
    assert all(not r.check.startswith("schema:") for r in rows), rows


def test_segmented_verdicts_catch_local_failures(spark):
    """contract_verdicts_by: a budget that holds table-wide fails in
    the one segment where violations concentrate — the regression a
    global rate dilutes away. Budgets apply PER segment; the plan is
    one grouped agg (|segments| x |rules| rows, never data rows)."""
    from anomalydetection_spark.operators.contract import (
        Contract,
        ColumnRule,
        ExpressionRule,
        contract_verdicts,
        contract_verdicts_by,
    )

    # 10 rows: segment 'a' has 2/5 nulls in note, segment 'b' has 0/5.
    # Global null rate = 0.2 <= 0.25 budget -> global pass; per-segment
    # 'a' is 0.4 -> fail.
    rows = [("a", i, None if i < 2 else "ok") for i in range(5)]
    rows += [("b", i, "ok") for i in range(5)]
    df = spark.createDataFrame(rows, "seg string, v bigint, note string")
    c = Contract(
        columns={"note": ColumnRule(max_null_rate=0.25)},
        expressions={"v_small": ExpressionRule(
            "v < 4", max_violation_rate=0.15)},
    )
    glob = {r.check: r.verdict for r in contract_verdicts(df, c).collect()
            if not r.check.startswith("schema:")}
    assert glob["rule:null"] == "pass"           # 0.2 <= 0.25 table-wide

    seg = {(r.seg, r.check): r for r in
           contract_verdicts_by(df, c, "seg").collect()}
    assert seg[("a", "rule:null")].verdict == "fail"
    assert seg[("a", "rule:null")].n_violations == 2
    assert seg[("b", "rule:null")].verdict == "pass"
    # expression rule judged per segment too: one v=4 per segment = 0.2
    assert seg[("a", "rule:expr:v_small")].verdict == "fail"
    assert seg[("b", "rule:expr:v_small")].verdict == "fail"
    # output leads with the segment column
    out = contract_verdicts_by(df, c, ["seg"])
    assert out.columns[0] == "seg"


def test_segmented_verdicts_guardrails(spark):
    """Absent segment column and segment/ruled overlap are loud
    ValueErrors; an uncompilable expression raises instead of being
    silently degraded (no structural tier in the segmented output);
    a dtype-only contract yields an empty frame that still carries
    the segment columns."""
    import pytest
    from anomalydetection_spark.operators.contract import (
        Contract,
        ColumnRule,
        ExpressionRule,
        contract_verdicts_by,
    )

    df = spark.createDataFrame(
        [("a", 1)], "seg string, v bigint")
    c = Contract(columns={"v": ColumnRule(min_value=0)})
    with pytest.raises(ValueError, match="absent segment"):
        contract_verdicts_by(df, c, "nope")
    with pytest.raises(ValueError, match="segment column"):
        contract_verdicts_by(
            df, Contract(columns={"seg": ColumnRule(nullable=False),
                                  "v": ColumnRule(min_value=0)}),
            "seg")
    with pytest.raises(Exception):  # AnalysisException, loud not silent
        contract_verdicts_by(
            df, Contract(expressions={"bad": ExpressionRule("no_col > 1")}),
            "seg")
    empty = contract_verdicts_by(
        df, Contract(columns={"v": ColumnRule(dtype="bigint")}), "seg")
    assert empty.columns[0] == "seg" and empty.count() == 0


def test_annotate_violations_row_tags(spark):
    """Keep-and-tag: every row survives with the sorted labels it
    violates; NULL comparisons are not violations (mirrors the counts
    path); element rules tag the row when ANY element violates; a
    rule-free contract yields empty arrays; expression typos raise."""
    import pytest

    from anomalydetection_spark.operators.contract import (
        Contract,
        annotate_violations,
        contract_from_dict,
    )

    df = spark.createDataFrame(
        [
            (1, "click", 10.0, [("text", "hi", 0)]),
            (2, "bogus", 500.0, [("bogus", None, -1)]),
            (3, None, None, None),
            (4, "purchase", 5.0, []),
        ],
        "id bigint, event_type string, value double,"
        " spans array<struct<kind string, text string, offset int>>",
    )
    c = contract_from_dict({
        "columns": {
            "event_type": {"allowed": ["click", "view", "purchase"]},
            "value": {"max_value": 400.0},
        },
        "expressions": {
            "pv": {"expr": "event_type <> 'purchase' OR value > 50"},
        },
        "elements": {
            "spans.kind": {"allowed": ["text", "image"]},
            "spans.offset": {"min_value": 0},
        },
    })
    out = {r["id"]: r["violations"]
           for r in annotate_violations(df, c).collect()}
    assert out[1] == []
    assert out[2] == [
        "event_type::allowed",
        "spans[*].kind::allowed",
        "spans[*].offset::min_value",
        "value::max_value",
    ]
    # NULL event_type/value: allowed/max_value comparisons are NULL ->
    # not violations; but the expression is NULL -> pessimistic tag;
    # NULL spans array -> element rules do not fire
    assert out[3] == ["*::expr:pv"]
    assert out[4] == ["*::expr:pv"]  # purchase with value <= 50

    assert annotate_violations(
        df, Contract()
    ).select("violations").distinct().collect()[0][0] == []

    with pytest.raises(Exception):
        annotate_violations(
            df, contract_from_dict({"expressions": {"bad": "no_col > 1"}})
        ).collect()
