"""Semi-structured (JSON) field validation over string columns.

Validation engines treat typed columns as the easy case; real tables
carry JSON blobs (event properties, API payloads) whose SCHEMA lives
only in the data. This operator audits such a column the way the
typed-column profiler audits the rest of the table: per key, how often
is it present, what value TYPES does it carry (a key that is number in
99% of rows and string in 1% is a producer bug), how often is it an
explicit JSON null, and how many rows fail to parse at all.

Spark-first shape — the whole audit is JVM-side VARIANT machinery
(``try_parse_json`` / ``variant_get`` / ``schema_of_variant``), no
Python UDF anywhere:

1. key DISCOVERY: one narrow scan, ``json_object_keys`` exploded +
   distinct. The result is schema-scale (bounded by ``max_keys``), so
   the collect is metadata, not data — same contract as the verdict
   value sets.
2. ONE audit scan: parse each row once, project an array of
   (key, normalized-type) structs over the discovered keys from
   literal variant paths, explode, and run a map-side-combinable
   groupBy (key, vtype). Output cardinality = |keys| x |types|,
   independent of row count.
3. ONE 1-row totals aggregate (raw non-null rows, parse failures),
   COLLECTED driver-side and inlined as literals — cross-joining it
   back would duplicate the parse subtree into every consumer branch.

Type normalization pins a cross-engine enum — number / string / bool /
array / object / null — because Spark reports physical variant types
(BIGINT, DECIMAL(3,2), DOUBLE) where DuckDB's ``json_type`` reports
UBIGINT/BIGINT/DOUBLE: the enum is the portable contract, the physical
type is not. An explicit JSON null normalizes to 'null' (Spark VOID);
an ABSENT key contributes no row at all — presence comes from the key
actually appearing, so (n of key) / n_raw IS the presence rate.

Reference analog: the reference stores parsed log parameters as
opaque JSON strings in SQLite (/root/reference/database_manager.py:
60-66) and never validates their shape; this gives that column class
a first-class audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "json_field_audit",
    "discover_json_keys",
    "suggest_json_rule",
    "variant_path",
    "MALFORMED_KEY",
]

MALFORMED_KEY = "__malformed__"


def variant_path(k: str) -> str:
    """Variant extraction path for a top-level key, bracket syntax
    (tolerant of spaces/dots). Variant paths have NO escape syntax, so
    pick the quote the key does not contain; a key containing BOTH
    quote kinds is inexpressible and refused rather than silently
    mis-pathed."""
    if '"' not in k:
        return '$["' + k + '"]'
    if "'" not in k:
        return "$['" + k + "']"
    raise ValueError(
        f"JSON key {k!r} contains both quote characters; "
        "variant paths cannot address it"
    )


def _norm_type(schema: Column) -> Column:
    """schema_of_variant output -> portable type enum (see module doc).
    NULL schema (absent key / unparseable row) stays NULL and is
    filtered out before aggregation."""
    return (
        F.when(schema.isNull(), F.lit(None).cast("string"))
        .when(schema == "VOID", "null")
        .when(schema == "BOOLEAN", "bool")
        .when(schema == "STRING", "string")
        .when(schema.startswith("ARRAY"), "array")
        .when(schema.startswith("OBJECT"), "object")
        .when(
            schema.isin("BIGINT", "DOUBLE", "FLOAT")
            | schema.startswith("DECIMAL"),
            "number",
        )
        .otherwise("other")
    )


def discover_json_keys(
    df: DataFrame, json_col: str, max_keys: int = 256
) -> list[str]:
    """Distinct top-level keys across the column, sorted. One narrow
    scan + a schema-scale distinct; malformed / NULL rows contribute
    nothing (``json_object_keys`` is NULL there). Raises if the key
    space exceeds ``max_keys`` — a key-per-row blob (ids as keys) is a
    modeling bug an audit should refuse to silently truncate."""
    rows = (
        df.select(F.explode(F.json_object_keys(F.col(json_col))).alias("k"))
        .distinct()
        .limit(max_keys + 1)
        .collect()
    )
    if len(rows) > max_keys:
        raise ValueError(
            f"{json_col}: more than {max_keys} distinct top-level keys; "
            "pass keys= explicitly or raise max_keys"
        )
    return sorted(r.k for r in rows)


def json_field_audit(
    df: DataFrame,
    json_col: str,
    keys: list[str] | None = None,
    max_keys: int = 256,
) -> DataFrame:
    """Per-key presence + type-mix audit of a JSON string column.

    Returns (key, vtype, n, rate): one row per discovered key per
    normalized value type it carries, plus a ``__malformed__`` /
    'malformed' row when any non-null value fails to parse. ``rate``
    is n / (non-null raw rows), rounded to 6dp — so a key present in
    every parseable row of a column with parse failures shows
    rate < 1, which is exactly the signal a validation gate wants.
    """
    if keys is None:
        keys = discover_json_keys(df, json_col, max_keys=max_keys)
    tot = _totals(df, json_col)
    counts = _audit_counts(df, json_col, keys)
    if tot.n_mal:
        counts = counts.unionByName(
            df.sparkSession.createDataFrame(
                [(MALFORMED_KEY, "malformed", int(tot.n_mal))],
                "key string, vtype string, n long",
            )
        )
    return counts.select(
        "key",
        "vtype",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double") / F.lit(int(tot.n_raw or 0)), 6
        ).alias("rate"),
    )


def _totals(df: DataFrame, json_col: str):
    """ONE aggregate, collected driver-side: (n_raw = non-null values,
    n_mal = parse failures). Collected rather than cross-joined back so
    the parse subtree is not duplicated into every consumer branch."""
    raw = F.col(json_col)
    return df.agg(
        F.count(raw).alias("n_raw"),
        F.sum(
            (raw.isNotNull() & F.try_parse_json(raw).isNull()).cast("long")
        ).alias("n_mal"),
    ).first()


def _audit_counts(df: DataFrame, json_col: str, keys: list[str]) -> DataFrame:
    """(key, vtype, n) counts plan over the declared keys — the single
    audit scan; empty key list degenerates to an empty frame."""
    raw = F.col(json_col)
    parsed = df.select(F.try_parse_json(raw).alias("_v"))

    path = variant_path

    if keys:
        kv = F.array(
            *[
                F.struct(
                    F.lit(k).alias("key"),
                    _norm_type(
                        F.schema_of_variant(
                            F.variant_get(F.col("_v"), path(k), "variant")
                        )
                    ).alias("vtype"),
                )
                for k in keys
            ]
        )
        counts = (
            parsed.select(F.explode(kv).alias("kv"))
            .select("kv.key", "kv.vtype")
            .filter(F.col("vtype").isNotNull())
            .groupBy("key", "vtype")
            .agg(F.count("*").cast("long").alias("n"))
        )
    else:
        # no keys (empty/unparseable corpus or an explicit []): the
        # audit degenerates to the malformed row alone
        counts = df.sparkSession.createDataFrame(
            [], "key string, vtype string, n long"
        )
    return counts


def suggest_json_rule(
    df: DataFrame,
    json_col: str,
    malformed_slack: float = 2.0,
    max_keys: int = 256,
) -> dict:
    """Derive a JSON-shape contract from the observed data — the
    semi-structured arm of operators/suggest.py: audit once, then
    propose ``required`` = keys present in EVERY parseable row,
    ``types`` = the exact observed type set per key, and a
    ``max_malformed_rate`` budget = observed rate x ``malformed_slack``
    (6dp away-from-zero rounded, floored at 1e-6 when any malformed
    row was observed; 0.0 when none were — a clean column stays
    zero-tolerance). Returns a ``Contract.json``-value dict compatible
    with ``contract_from_dict`` ({"json": {col: <this>}}); by
    construction the profiled table passes its own suggestion (pinned
    in tests).

    Cost: key discovery + ONE totals aggregate + ONE audit counts scan
    (the same internals the audit uses — nothing is computed twice);
    the derivation itself runs on the collected counts rows —
    metadata scale."""
    from .suggest import _r6

    keys = discover_json_keys(df, json_col, max_keys=max_keys)
    tot = _totals(df, json_col)
    audit = _audit_counts(df, json_col, keys).collect()
    n_parseable = (tot.n_raw or 0) - (tot.n_mal or 0)
    present: dict[str, int] = {}
    types: dict[str, set] = {}
    for r in audit:
        if r.key == MALFORMED_KEY:
            continue
        present[r.key] = present.get(r.key, 0) + r.n
        types.setdefault(r.key, set()).add(r.vtype)
    budget = 0.0
    if tot.n_mal:
        budget = max(
            _r6(min(1.0, tot.n_mal / tot.n_raw * malformed_slack)), 1e-6
        )
    return {
        "required": sorted(
            k for k, n in present.items() if n == n_parseable and n > 0
        ),
        "types": {k: sorted(v) for k, v in sorted(types.items())},
        "max_malformed_rate": budget,
    }
