"""Schema-evolution compatibility: can data written under an OLD
schema still be read and consumed when the table moves to a NEW schema
— the Iceberg schema-evolution rules (add / drop / rename / widen /
make-optional) as a pure-metadata check.

The contract module (operators/contract.py::schema_diff) judges one
snapshot against a DECLARED contract; this judges two SCHEMA VERSIONS
against each other, the question a 10^12-doc table asks on every
writer upgrade: "will yesterday's files and today's readers still
agree?". Pure driver-side analysis — schemas are metadata, no data is
touched regardless of table size.

Compatibility model (the Iceberg/Avro consensus, public semantics):

* added optional column → ok (old files read NULL for it)
* added required (non-nullable) column → **reader_break** — old data
  files have no value to supply
* dropped column → **consumer_break** — downstream readers selecting
  it fail (Iceberg allows the drop; the flag is about consumers)
* type widened (int→long, float→double, decimal precision up at equal
  scale) → ok
* any other type change → **reader_break**
* required→optional → ok; optional→required → **reader_break**
  (existing NULLs violate the new constraint)
* nested struct fields recurse with dotted paths; array elements as
  ``col.element``, map values as ``col.value``; map KEY type changes
  are always reader_break (no widening defined for keys)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: (old, new) primitive pairs that are safe widenings
_WIDENINGS = {
    ("integer", "long"),
    ("float", "double"),
    ("date", "timestamp"),
    ("short", "integer"),
    ("short", "long"),
    ("byte", "short"),
    ("byte", "integer"),
    ("byte", "long"),
}

OK = "ok"
READER_BREAK = "reader_break"
CONSUMER_BREAK = "consumer_break"

COMPAT_SCHEMA = "path string, change string, compat string, detail string"


def _type_change(path: str, old: T.DataType, new: T.DataType,
                 out: list[dict]) -> None:
    if old.simpleString() == new.simpleString():
        return
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        _struct_diff(path + ".", old, new, out)
        return
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        _type_change(f"{path}.element", old.elementType, new.elementType,
                     out)
        if old.containsNull and not new.containsNull:
            out.append({
                "path": f"{path}.element", "change": "required",
                "compat": READER_BREAK,
                "detail": "array element optional→required",
            })
        elif not old.containsNull and new.containsNull:
            out.append({
                "path": f"{path}.element", "change": "optional",
                "compat": OK,
                "detail": "array element required→optional",
            })
        return
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        if old.keyType.simpleString() != new.keyType.simpleString():
            out.append({
                "path": f"{path}.key", "change": "type",
                "compat": READER_BREAK,
                "detail": f"map key {old.keyType.simpleString()} → "
                          f"{new.keyType.simpleString()} (keys never "
                          "widen)",
            })
        _type_change(f"{path}.value", old.valueType, new.valueType, out)
        if old.valueContainsNull and not new.valueContainsNull:
            out.append({
                "path": f"{path}.value", "change": "required",
                "compat": READER_BREAK,
                "detail": "map value optional→required",
            })
        elif not old.valueContainsNull and new.valueContainsNull:
            out.append({
                "path": f"{path}.value", "change": "optional",
                "compat": OK,
                "detail": "map value required→optional",
            })
        return
    if isinstance(old, T.DecimalType) and isinstance(new, T.DecimalType):
        if new.scale == old.scale and new.precision >= old.precision:
            out.append({
                "path": path, "change": "widen", "compat": OK,
                "detail": f"{old.simpleString()} → {new.simpleString()}",
            })
        else:
            out.append({
                "path": path, "change": "type", "compat": READER_BREAK,
                "detail": f"{old.simpleString()} → {new.simpleString()} "
                          "(decimal only widens at equal scale)",
            })
        return
    pair = (old.typeName(), new.typeName())
    if pair in _WIDENINGS:
        out.append({
            "path": path, "change": "widen", "compat": OK,
            "detail": f"{old.simpleString()} → {new.simpleString()}",
        })
    else:
        out.append({
            "path": path, "change": "type", "compat": READER_BREAK,
            "detail": f"{old.simpleString()} → {new.simpleString()}",
        })


def _struct_diff(prefix: str, old: T.StructType, new: T.StructType,
                 out: list[dict]) -> None:
    old_f = {f.name: f for f in old.fields}
    new_f = {f.name: f for f in new.fields}
    for name, nf in new_f.items():
        path = prefix + name
        of = old_f.get(name)
        if of is None:
            if nf.nullable:
                out.append({
                    "path": path, "change": "add", "compat": OK,
                    "detail": "optional column added (old files read "
                              "NULL)",
                })
            else:
                out.append({
                    "path": path, "change": "add", "compat": READER_BREAK,
                    "detail": "required column added — old data files "
                              "have no value to supply",
                })
            continue
        _type_change(path, of.dataType, nf.dataType, out)
        if of.nullable and not nf.nullable:
            out.append({
                "path": path, "change": "required",
                "compat": READER_BREAK,
                "detail": "optional→required (existing NULLs violate "
                          "the new constraint)",
            })
        elif not of.nullable and nf.nullable:
            out.append({
                "path": path, "change": "optional", "compat": OK,
                "detail": "required→optional",
            })
    for name in old_f:
        if name not in new_f:
            out.append({
                "path": prefix + name, "change": "drop",
                "compat": CONSUMER_BREAK,
                "detail": "column dropped — downstream readers "
                          "selecting it fail",
            })


def schema_compat(old: T.StructType, new: T.StructType) -> list[dict]:
    """Every evolution step between two schema versions, each judged
    ok / reader_break / consumer_break. Empty list ⇔ the schemas are
    identical. Deterministic: rows come out sorted by path then
    change."""
    out: list[dict] = []
    _struct_diff("", old, new, out)
    return sorted(out, key=lambda r: (r["path"], r["change"]))


def schema_compat_df(
    spark: SparkSession, old: T.StructType, new: T.StructType
) -> DataFrame:
    """DataFrame form of :func:`schema_compat` (COMPAT_SCHEMA shape) —
    for sinking beside other verdicts."""
    rows = [
        (r["path"], r["change"], r["compat"], r["detail"])
        for r in schema_compat(old, new)
    ]
    return spark.createDataFrame(rows, COMPAT_SCHEMA)
