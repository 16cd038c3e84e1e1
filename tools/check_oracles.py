"""Local replica of the driver's correctness gate: run each Spark query
and its DuckDB oracle at sf0.01, compare row count, column names, and an
order-insensitive value hash (columns sorted by name, floats rounded).

Usage: python tools/check_oracles.py [--json OUT.json] [query ...]

--json writes the per-query verdicts in the driver's
CORRECTNESS_r{N}.json record shape (plus a `seconds` field and an
`oracle` flag) — the per-round full-catalog artifact
(ORACLES_FULL_r{N}.json) that covers the queries rotated out of the
driver's 50-entry window.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = []
    for row in rows:
        vals = []
        for i in idx:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 4)
                if v == -0.0:
                    v = 0.0
            vals.append(repr(v))
        canon.append("|".join(vals))
    canon.sort()
    return hashlib.md5("\n".join(canon).encode()).hexdigest()


def main() -> int:
    from __spark_entry__ import entry, oracle_sql, queries
    from anomalydetection_spark.session import get_spark

    spark = get_spark(
        master="local[8]",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = queries()
    oracles = oracle_sql()
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            sys.exit("usage: check_oracles.py [--json OUT.json] [names...]")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    only = set(argv)
    failures = 0
    records: dict[str, dict] = {}

    def record(name, t0, *, srows=None, drows=None, rows_match=None,
               schema_match=None, hash_match=None, err=None, oracle=True):
        records[name] = {
            "rows_match": rows_match,
            "schema_match": schema_match,
            "hash_match": hash_match,
            "spark_rows": None if srows is None else len(srows),
            "oracle_rows": None if drows is None else len(drows),
            "err": err,
            "oracle": oracle,
            "seconds": round(time.time() - t0, 2),
        }

    e = entry(spark)
    n = e.count()
    print(f"entry: {n} rows, schema={[f.name for f in e.schema.fields]}")

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = [f.name.lower() for f in sdf.schema.fields]
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {str(ex)[:300]}")
            record(name, t0, err=f"spark: {str(ex)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            record(name, t0, srows=srows, err="no_oracle", oracle=False)
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0].lower() for d in res.description]
            drows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            record(name, t0, srows=srows, err=f"duckdb: {str(ex)[:200]}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            h1, h2 = value_hash(srows, scols), value_hash(drows, dcols)
            if h1 != h2:
                problems.append("value-hash mismatch")
        record(
            name, t0, srows=srows, drows=drows,
            rows_match=len(srows) == len(drows),
            schema_match=sorted(scols) == sorted(dcols),
            hash_match=not problems,
        )
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)} ({time.time()-t0:.1f}s)")
            if "value-hash mismatch" in problems and srows:
                idx_s = sorted(range(len(scols)), key=lambda i: scols[i])
                idx_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ss = sorted("|".join(repr(round(r[i],4) if isinstance(r[i],float) else r[i]) for i in idx_s) for r in srows)
                dd = sorted("|".join(repr(round(r[i],4) if isinstance(r[i],float) else r[i]) for i in idx_d) for r in drows)
                for a, b in zip(ss, dd):
                    if a != b:
                        print(f"   spark:  {a[:160]}")
                        print(f"   duckdb: {b[:160]}")
                        break
            failures += 1
        else:
            print(f"ok   {name}: {len(srows)} rows match ({time.time()-t0:.1f}s)")

    print(f"\n{failures} failures / {len(only) if only else len(qs)} queries")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(records, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(records)} records)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
