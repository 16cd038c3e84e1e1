"""Constraint suggestion: profile a table, propose the contract.

Closes the validation loop the way Deequ's ConstraintSuggestion does:
instead of a human hand-writing `operators/contract.py` rules, the
engine derives them from observed data — null budgets from measured
null rates, numeric ranges from observed min/max (with slack), closed
value sets for low-cardinality strings, uniqueness candidates from
distinct counts. The suggested dict is `contract_from_dict`-compatible,
so `suggest -> validate` is one pipeline; by construction the profiled
table itself passes its own suggested contract (pinned in tests).

Cost shape: ONE `profile_table` aggregation pass over the data plus
ONE bounded second pass that materializes value sets ONLY for columns
the profile already gated to <= `allowed_max_cardinality` distinct
values (collect_set state is bounded by that gate, map-side combined).
Rule derivation itself runs on the profile output — columns x metrics
rows, metadata scale, never data scale.

Reference analog: none — the reference's SQLite tables carry no
declared expectations at all (/root/reference/database_manager.py:
28-78); this generalizes its implicit "what the parser produced last
time is the schema" behavior into explicit, reviewable rules.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["suggest_rules", "suggest_contract"]

_NUMERIC = T.NumericType
# profile_table stores min/max rounded to 4dp: half the last-place
# unit bounds the rounding error, and every suggested numeric bound is
# padded by it so the profiled table can never fail its own suggestion
_PROFILE_ROUND_EPS = 5e-5


def _r6(v: float) -> float:
    """Round half-AWAY-from-zero to 6dp — the SQL-engine convention
    (Spark round / DuckDB round), NOT Python's banker's rounding; keeps
    suggested budgets bit-identical to a SQL re-derivation."""
    return math.copysign(math.floor(abs(v) * 1e6 + 0.5) / 1e6, v)


def _profile_map(
    df: DataFrame, columns: list[str] | None, exact_distinct: bool
) -> dict[str, dict[str, float]]:
    from .profile import profile_table

    prof = profile_table(df, columns=columns, exact_distinct=exact_distinct)
    out: dict[str, dict[str, float]] = {}
    for r in prof.collect():  # columns x metrics rows — metadata scale
        out.setdefault(r["column"], {})[r["metric"]] = r["value"]
    return out


def _allowed_sets(
    df: DataFrame, cand: list[str]
) -> dict[str, list[str]]:
    """One bounded pass: sorted distinct value set per candidate column
    (candidates are pre-gated to low cardinality, so collect_set state
    is bounded)."""
    if not cand:
        return {}
    row = df.agg(
        *[F.sort_array(F.collect_set(c)).alias(c) for c in cand]
    ).first()
    return {c: list(row[c]) for c in cand}


def suggest_rules(
    df: DataFrame,
    columns: list[str] | None = None,
    *,
    exact_distinct: bool = False,
    distinct_rsd: float = 0.02,
    allowed_max_cardinality: int = 16,
    null_rate_slack: float = 2.0,
    range_slack: float = 0.1,
) -> DataFrame:
    """Long-form suggestions: (column, rule, num_value, str_value).

    Rules emitted per column:
    * ``not_null`` (num 0.0) when the observed null rate is exactly 0,
      else ``max_null_rate`` with budget = min(1, rate x slack).
    * numeric: ``min_value`` (0 when the column is PROVABLY
      non-negative through the profile's 4dp rounding — the Deequ
      isNonNegative shape; -5e-5 when the stored min is 0-ish; else
      observed min minus ``range_slack`` x observed range) and
      ``max_value`` (observed max plus the same slack). Every bound is
      padded by the profile rounding quantum so the profiled table can
      never fail its own suggestion, and rounded to 6dp.
    * string with distinct count <= ``allowed_max_cardinality``:
      ``allowed`` with str_value = the sorted value set joined by ','.
    * ``unique_candidate`` when distinct == NON-NULL rows (exact mode)
      or distinct >= (1 - 3 x rsd) x non-null rows (sketched mode — the
      tolerance is the estimator's own error band, documented, so
      id-like columns are flagged for the uniqueness OPERATOR to verify
      exactly rather than asserted unique from a sketch). Uniqueness is
      over non-null values (the Deequ isUnique convention — distinct
      counts exclude NULL); the null budget is a separate rule.

    With ``exact_distinct=False`` (the 10^12-doc default) distinct
    counts come from the profile's HLL/approx sketch — suggestion is a
    human-review step, so sketch-grade gates are the right cost; pass
    ``exact_distinct=True`` for bit-deterministic output (the oracled
    catalog query does).
    """
    schema = {f.name: f.dataType for f in df.schema.fields}
    cols = columns or df.columns
    prof = _profile_map(df, cols, exact_distinct)
    cand = [
        c
        for c in cols
        if isinstance(schema[c], T.StringType)
        and prof[c]["n_distinct"] is not None
        and 1 <= prof[c]["n_distinct"] <= allowed_max_cardinality
    ]
    # a value containing the separator would corrupt the round-trip
    # through the long-form (column, rule, str_value) row — skip the
    # closed-set rule for such columns (null/len rules still apply)
    sets = {
        c: vals
        for c, vals in _allowed_sets(df, cand).items()
        if not any("," in v for v in vals)
    }

    rows: list[tuple] = []
    for c in cols:
        p = prof[c]
        n = p["n_rows"]
        null_rate = p["null_rate"] or 0.0
        # gate on the EXACT null count, not the 6dp-rounded rate: at
        # 10^12 rows a 1e-9 null rate rounds to 0.0 and would suggest a
        # not_null rule the table itself violates; symmetric floor on
        # the budget so rounding can't under-budget an ultra-rare rate
        if p["n_null"] == 0:
            rows.append((c, "not_null", 0.0, None))
        else:
            rows.append(
                (c, "max_null_rate",
                 max(_r6(min(1.0, null_rate * null_rate_slack)), 1e-6),
                 None)
            )
        if isinstance(schema[c], _NUMERIC) and p.get("min") is not None:
            # the profile's min/max are 4dp-rounded (|true - stored| <=
            # 5e-5), so every suggested bound is padded by that quantum
            # — otherwise a column whose slack is below the rounding
            # error (range 0, or true min in (-5e-5, 0)) FAILS its own
            # suggested contract. The >= 0 shortcut likewise needs the
            # stored min to clear the quantum before 0.0 is provably a
            # valid lower bound.
            rng = p["max"] - p["min"]
            if p["min"] >= _PROFILE_ROUND_EPS:
                mn = 0.0  # provably non-negative even after rounding
            elif p["min"] >= 0:
                # stored 0.0 could hide a true min just below zero —
                # keep the tight non-negative bound, padded by the
                # quantum only
                mn = -_PROFILE_ROUND_EPS
            else:
                mn = _r6(p["min"] - range_slack * rng - _PROFILE_ROUND_EPS)
            rows.append((c, "min_value", mn, None))
            rows.append(
                (c, "max_value",
                 _r6(p["max"] + range_slack * rng + _PROFILE_ROUND_EPS),
                 None)
            )
        if c in sets:
            rows.append((c, "allowed", None, ",".join(sets[c])))
        # uniqueness is over NON-NULL values (Deequ isUnique shape):
        # distinct counts never include NULL, so gating on total rows
        # would bar any column with a single null from ever being
        # flagged; the null budget is emitted independently above
        nd = p["n_distinct"]
        nn = n - (p["n_null"] or 0)
        if nd is not None and nn and (
            nd == nn if exact_distinct else nd >= (1 - 3 * distinct_rsd) * nn
        ):
            rows.append((c, "unique_candidate", None, None))

    return df.sparkSession.createDataFrame(
        rows, "column string, rule string, num_value double, str_value string"
    )


def detect_json_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    min_object_rate: float = 0.9,
) -> list[str]:
    """String columns whose non-null values are >= ``min_object_rate``
    parseable JSON OBJECTS (leading '{' required: bare numbers and
    quoted scalars parse as variants too, but a payload column means
    objects). ONE map-side-combinable aggregate over the candidate
    string columns — two conditional counts per column, no UDF."""
    cand = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, T.StringType)
        and (columns is None or f.name in columns)
    ]
    if not cand:
        return []
    aggs = []
    for c in cand:
        col = F.col(c)
        ok = F.try_parse_json(col).isNotNull() & F.trim(col).startswith("{")
        aggs.append(F.count(col).alias(f"{c}__n"))
        aggs.append(F.sum(ok.cast("long")).alias(f"{c}__ok"))
    r = df.agg(*aggs).first()
    return [
        c
        for c in cand
        if (r[f"{c}__n"] or 0) > 0
        and (r[f"{c}__ok"] or 0) / r[f"{c}__n"] >= min_object_rate
    ]


def suggest_contract(
    df: DataFrame,
    columns: list[str] | None = None,
    detect_json: bool = True,
    **kwargs,
) -> tuple[dict, list[str]]:
    """(contract dict, uniqueness candidates).

    The dict is ``contract_from_dict``-compatible — dtype pinned from
    the observed schema, data rules from :func:`suggest_rules`, and
    (``detect_json``) JSON-shape rules for string columns whose values
    are overwhelmingly JSON objects (:func:`detect_json_columns` →
    ``semistructured.suggest_json_rule``): required keys, observed
    type sets, malformed budget. Uniqueness candidates are returned
    separately: uniqueness is the uniqueness OPERATOR's job (salted
    exact check), not a per-row contract rule."""
    schema = {f.name: f.dataType for f in df.schema.fields}
    sug = suggest_rules(df, columns, **kwargs).collect()
    cols: dict[str, dict] = {}
    unique: list[str] = []
    for r in sug:
        c = r["column"]
        rule = cols.setdefault(c, {"dtype": schema[c].simpleString()})
        if r["rule"] == "not_null":
            rule["max_null_rate"] = 0.0
        elif r["rule"] == "max_null_rate":
            rule["max_null_rate"] = r["num_value"]
        elif r["rule"] == "min_value":
            rule["min_value"] = r["num_value"]
        elif r["rule"] == "max_value":
            rule["max_value"] = r["num_value"]
        elif r["rule"] == "allowed":
            rule["allowed"] = r["str_value"].split(",")
        elif r["rule"] == "unique_candidate":
            unique.append(c)
    out: dict = {"closed": False, "columns": cols}
    if detect_json:
        jcols = detect_json_columns(df, columns)
        if jcols:
            from .semistructured import suggest_json_rule

            out["json"] = {c: suggest_json_rule(df, c) for c in jcols}
            # a JSON payload column is shaped by its json rule, not by
            # a closed value set over raw blobs
            for c in jcols:
                if c in cols:
                    cols[c].pop("allowed", None)
    return out, unique
