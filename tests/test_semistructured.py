"""Round-4m additions: semi-structured JSON field audit
(operators/semistructured.py), the lang x source independence audit,
and the cross-source near-dup leakage matrix — planted fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from anomalydetection_spark.operators.semistructured import (
    MALFORMED_KEY,
    discover_json_keys,
    json_field_audit,
)


def _jdf(spark, blobs):
    return spark.createDataFrame([(b,) for b in blobs], "j string")


def test_json_field_audit_planted(spark):
    """Every output row pinned on a 6-blob fixture covering the whole
    type enum, a type-mix key, explicit JSON null vs absent, a
    malformed blob, and a NULL raw value (excluded from n_raw's
    complement but counted in the denominator contract: rate is over
    NON-NULL raw rows)."""
    blobs = [
        '{"a": 1, "b": "x"}',          # a number, b string
        '{"a": "oops", "b": "y"}',     # a TYPE-MIX: string here
        '{"a": 2.5, "c": [1], "d": {"e": 1}, "f": true, "g": null}',
        '{"a": 3}',
        '{"bad":',                     # malformed
        None,                          # NULL raw: not in n_raw
    ]
    out = {
        (r.key, r.vtype): (r.n, r.rate)
        for r in json_field_audit(_jdf(spark, blobs), "j").collect()
    }
    n_raw = 5  # non-null raw rows
    assert out[("a", "number")] == (3, round(3 / n_raw, 6))
    assert out[("a", "string")] == (1, round(1 / n_raw, 6))
    assert out[("b", "string")] == (2, round(2 / n_raw, 6))
    assert out[("c", "array")] == (1, round(1 / n_raw, 6))
    assert out[("d", "object")] == (1, round(1 / n_raw, 6))
    assert out[("f", "bool")] == (1, round(1 / n_raw, 6))
    assert out[("g", "null")] == (1, round(1 / n_raw, 6))
    assert out[(MALFORMED_KEY, "malformed")] == (1, round(1 / n_raw, 6))
    assert len(out) == 8  # nothing else: absent keys contribute no row


def test_json_field_audit_no_malformed_row_when_clean(spark):
    out = json_field_audit(_jdf(spark, ['{"a": 1}', '{"a": 2}']), "j")
    rows = out.collect()
    assert {(r.key, r.vtype, r.n) for r in rows} == {("a", "number", 2)}


def test_json_field_audit_key_quoting(spark):
    """Keys with spaces and quotes survive the bracket-path build."""
    out = json_field_audit(
        _jdf(spark, ['{"a b": 1, "c\'d": "x"}']), "j"
    ).collect()
    assert {(r.key, r.vtype) for r in out} == {
        ("a b", "number"),
        ("c'd", "string"),
    }


def test_discover_json_keys_cap(spark):
    blobs = ['{"k%d": 1}' % i for i in range(12)]
    with pytest.raises(ValueError, match="more than 8"):
        discover_json_keys(_jdf(spark, blobs), "j", max_keys=8)
    assert len(discover_json_keys(_jdf(spark, blobs), "j", max_keys=12)) == 12


def test_field_independence_planted_bias(spark):
    """2x2 fixture with an engineered dependent cell: ('en','s1')
    holds 30 of 60 rows where independence expects 40*40/60 ~ 26.67.
    Residuals checked against the closed form."""
    rows = (
        [("en", "s1")] * 30
        + [("en", "s2")] * 10
        + [("de", "s1")] * 10
        + [("de", "s2")] * 10
    )
    df = spark.createDataFrame(rows, "lang string, source string")
    from anomalydetection_spark.queries import q_field_independence

    import anomalydetection_spark.queries as Q

    # route the query through the planted frame
    orig = Q._t
    Q._t = lambda spark, sf_dir, name: df
    try:
        got = {
            (r.lang, r.source): (r.n_obs, r.expected, r.std_residual)
            for r in q_field_independence(spark, "ignored").collect()
        }
    finally:
        Q._t = orig
    e = 40.0 * 40.0 / 60.0
    assert got[("en", "s1")] == (
        30,
        round(e, 6),
        round((30 - e) / math.sqrt(e), 6),
    )
    # residuals of the complementary cells are negative
    assert got[("en", "s2")][2] < 0 and got[("de", "s1")][2] < 0
    assert got[("de", "s2")][2] > 0


def test_cross_source_dup_matrix_planted(spark):
    """Two exact copies in DIFFERENT sources -> one off-diagonal pair;
    two copies in the SAME source -> one diagonal pair; the unique doc
    contributes nothing."""
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    dup2 = "one two three four five six seven eight nine"
    df = spark.createDataFrame(
        [
            (0, dup, "srcA"),
            (1, dup, "srcB"),
            (2, dup2, "srcC"),
            (3, dup2, "srcC"),
            (4, "totally different words entirely unrelated here", "srcA"),
        ],
        "doc_id long, text string, source string",
    )
    from anomalydetection_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", n_hashes=8, bands=4, threshold=0.8
    )
    src = df.select("doc_id", "source")
    j = (
        pairs.join(
            src.select(F.col("doc_id").alias("a_id"), F.col("source").alias("sa")),
            "a_id",
        )
        .join(
            src.select(F.col("doc_id").alias("b_id"), F.col("source").alias("sb")),
            "b_id",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .count()
    )
    got = {(r.source_a, r.source_b): r["count"] for r in j.collect()}
    assert got == {("srcA", "srcB"): 1, ("srcC", "srcC"): 1}


def test_json_contract_rules_planted(spark):
    """JsonRule verdicts on a 5-row fixture: malformed within budget
    passes, required-key absence fails, a type-mix key fails, a
    conforming key passes."""
    from anomalydetection_spark.operators.contract import (
        Contract,
        JsonRule,
        contract_verdicts,
    )

    df = _jdf(
        spark,
        [
            '{"k": 1, "s": "a"}',
            '{"k": 2, "s": "b"}',
            '{"k": "oops", "s": "c"}',   # type-mix on k
            '{"s": "d"}',                # k absent
            "{bad",                      # malformed
        ],
    )
    c = Contract(
        json={
            "j": JsonRule(
                required=("k", "s"),
                types={"k": ("number",), "s": ("string",)},
                max_malformed_rate=0.25,  # 1/5 = 0.2 <= budget
            )
        }
    )
    got = {
        r.check: (r.n_violations, r.violation_rate, r.verdict)
        for r in contract_verdicts(df, c).collect()
    }
    assert got["rule:json_malformed"] == (1, 0.2, "pass")
    assert got["rule:json_required:k"] == (1, 0.2, "fail")
    assert got["rule:json_required:s"] == (0, 0.0, "pass")
    assert got["rule:json_type:k"] == (1, 0.2, "fail")
    assert got["rule:json_type:s"] == (0, 0.0, "pass")
    # zero budget flips malformed to fail
    c0 = Contract(json={"j": JsonRule(max_malformed_rate=0.0)})
    got0 = {
        r.check: r.verdict for r in contract_verdicts(df, c0).collect()
    }
    assert got0["rule:json_malformed"] == "fail"


def test_json_contract_structural(spark):
    """A json rule on a non-string or absent column is a structural
    failure, never an agg-pass crash."""
    from anomalydetection_spark.operators.contract import (
        Contract,
        JsonRule,
        contract_verdicts,
    )

    df = spark.createDataFrame([(1, '{"a":1}')], "n long, j string")
    c = Contract(
        json={
            "n": JsonRule(required=("a",)),
            "zz": JsonRule(required=("a",)),
            "j": JsonRule(required=("a",)),
        }
    )
    rows = contract_verdicts(df, c).collect()
    struct = {
        r.column: r.detail
        for r in rows
        if r.check == "schema:invalid_json_rule"
    }
    assert "expected string column" in struct["n"]
    assert struct["zz"] == "column absent"
    data = {r.check: r.verdict for r in rows if r.check.startswith("rule:")}
    # the valid column's rules still compiled and ran
    assert data["rule:json_required:a"] == "pass"


def test_json_contract_from_dict(spark):
    from anomalydetection_spark.operators.contract import (
        contract_from_dict,
        contract_verdicts,
    )

    c = contract_from_dict(
        {
            "json": {
                "j": {
                    "required": ["k"],
                    "types": {"k": ["number", "null"]},
                    "max_malformed_rate": 0.5,
                }
            }
        }
    )
    assert c.json["j"].required == ("k",)
    assert c.json["j"].types == {"k": ("number", "null")}
    df = _jdf(spark, ['{"k": 1}', '{"k": null}'])
    got = {r.check: r.verdict for r in contract_verdicts(df, c).collect()}
    assert set(got.values()) == {"pass"}


def test_suggest_json_rule_planted_and_self_validates(spark):
    from anomalydetection_spark.operators.contract import (
        contract_from_dict,
        contract_verdicts,
    )
    from anomalydetection_spark.operators.semistructured import (
        suggest_json_rule,
    )

    df = _jdf(
        spark,
        [
            '{"k": 1, "s": "a"}',
            '{"k": 2.5, "s": "b", "extra": true}',
            '{"k": "mixed", "s": "c"}',
            "{oops",                      # malformed
            None,
        ],
    )
    sug = suggest_json_rule(df, "j")
    # k and s appear in all 3 parseable rows; extra only in one
    assert sug["required"] == ["k", "s"]
    assert sug["types"] == {
        "extra": ["bool"],
        "k": ["number", "string"],
        "s": ["string"],
    }
    # observed malformed rate 1/4 non-null rows, x2 slack
    assert sug["max_malformed_rate"] == 0.5
    # the suggestion validates its own table
    c = contract_from_dict({"json": {"j": sug}})
    verdicts = contract_verdicts(df, c).collect()
    assert all(r.verdict == "pass" for r in verdicts), verdicts


def test_suggest_json_rule_clean_column_zero_budget(spark):
    from anomalydetection_spark.operators.semistructured import (
        suggest_json_rule,
    )

    sug = suggest_json_rule(_jdf(spark, ['{"a": 1}', '{"a": 2}']), "j")
    assert sug["max_malformed_rate"] == 0.0
    assert sug["required"] == ["a"]


def test_annotate_violations_json_tags(spark):
    """Keep-and-tag covers json rules: each row gains the exact
    column::json_* labels it violates, clean rows get []."""
    from anomalydetection_spark.operators.contract import (
        Contract,
        JsonRule,
        annotate_violations,
    )

    df = spark.createDataFrame(
        [
            (0, '{"k": 1}'),
            (1, '{"k": "oops"}'),
            (2, '{"z": 9}'),
            (3, "{bad"),
            (4, None),
        ],
        "i long, j string",
    )
    c = Contract(
        json={"j": JsonRule(required=("k",), types={"k": ("number",)})}
    )
    got = {
        r.i: list(r.violations)
        for r in annotate_violations(df, c).collect()
    }
    assert got[0] == []
    assert got[1] == ["j::json_type:k"]
    assert got[2] == ["j::json_required:k"]
    assert got[3] == ["j::json_malformed"]
    assert got[4] == []  # NULL raw: not malformed, not required-checked


def test_detect_json_columns_and_suggest_integration(spark):
    """suggest_contract auto-detects the JSON payload column, attaches
    a self-validating json rule, and leaves plain string columns
    alone (bare scalars don't count as payloads)."""
    from anomalydetection_spark.operators.contract import (
        contract_from_dict,
        contract_verdicts,
    )
    from anomalydetection_spark.operators.suggest import (
        detect_json_columns,
        suggest_contract,
    )

    df = spark.createDataFrame(
        [
            (1, '{"k": 1}', "plain", "5"),
            (2, '{"k": 2}', "text", "6"),
            (3, '{"k": 3}', "here", "7"),
        ],
        "i long, payload string, s string, numstr string",
    )
    # numstr parses as a variant scalar but is NOT an object column
    assert detect_json_columns(df) == ["payload"]
    contract, _unique = suggest_contract(df, exact_distinct=True)
    assert set(contract["json"]) == {"payload"}
    assert contract["json"]["payload"]["required"] == ["k"]
    # payload must not ALSO carry a closed value set over raw blobs
    assert "allowed" not in contract["columns"].get("payload", {})
    # the whole suggestion (typed + json) self-validates
    verdicts = contract_verdicts(df, contract_from_dict(contract))
    assert all(r.verdict == "pass" for r in verdicts.collect())


def test_json_rule_data_derived_key_with_quote(spark):
    """A JSON key containing a quote (data-derived keys reach rule
    labels via suggest_contract) must flow through the whole verdict
    path — labels never touch a SQL parser."""
    from anomalydetection_spark.operators.contract import (
        Contract,
        JsonRule,
        annotate_violations,
        contract_verdicts,
    )

    df = _jdf(spark, ['{"it\'s": 1}', '{"it\'s": "x"}'])
    c = Contract(
        json={"j": JsonRule(required=("it's",), types={"it's": ("number",)})}
    )
    got = {
        r.check: r.verdict for r in contract_verdicts(df, c).collect()
    }
    assert got["rule:json_required:it's"] == "pass"
    assert got["rule:json_type:it's"] == "fail"
    tags = [
        list(r.violations)
        for r in annotate_violations(df, c).collect()
    ]
    assert tags == [[], ["j::json_type:it's"]]


def test_json_contract_from_dict_rejects_bare_strings(spark):
    """A string where a list is expected must raise, not silently
    explode into characters."""
    from anomalydetection_spark.operators.contract import contract_from_dict

    with pytest.raises(ValueError, match="'required' must be a list"):
        contract_from_dict({"json": {"j": {"required": "key"}}})
    with pytest.raises(ValueError, match="must be a list of type names"):
        contract_from_dict({"json": {"j": {"types": {"k": "number"}}}})
