#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, loads the Spark result from <outDir>/<name>/, and
compares: columns sorted by name, COLUMN TYPES (the driver's hash is
type-sensitive — a DuckDB HUGEINT vs Spark BIGINT drift fails the driver
even when every value matches, which is exactly what shipped q90/q94/q102
broken in round 3), rows sorted by all columns, values compared exactly
(floats to 1e-9 rel tol, reported separately if only tol-equal).

Usage: python3 tools/check.py <sfDir> <outDir>
(run graft.Verify first to populate <outDir>)
"""
import json
import math
import sys
from pathlib import Path

import duckdb


def canon(rows, cols, types):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], [norm_type(types[i]) for i in order], out


def norm_type(t):
    """Canonical DuckDB type name. Only cosmetic aliases collapse; width
    drifts the driver can see (HUGEINT vs BIGINT) must stay distinct."""
    s = str(t).upper()
    return {"INT64": "BIGINT", "INT32": "INTEGER", "INT128": "HUGEINT",
            "FLOAT8": "DOUBLE", "FLOAT4": "FLOAT", "STRING": "VARCHAR",
            "TEXT": "VARCHAR", "BOOL": "BOOLEAN"}.get(s, s)


def norm(v):
    import datetime
    import decimal
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    return v


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        if a == b:
            return "exact"
        if math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9):
            return "tol"
        return False
    return "exact" if a == b else False


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = Path(out_dir, name)
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            o = con.sql(oracle[name])
            o_cols, o_types = list(o.columns), list(o.types)
            o_rows = o.fetchall()
            sp = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'")
            s_cols, s_types = list(sp.columns), list(sp.types)
            s_rows = sp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        oc, oty, orows = canon(o_rows, o_cols, o_types)
        sc, sty, srows = canon(s_rows, s_cols, s_types)
        if oc != sc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            n_fail += 1
            continue
        if oty != sty:
            diff = [f"{c}: spark={a} oracle={b}"
                    for c, a, b in zip(oc, sty, oty) if a != b]
            print(f"FAIL {name}: column TYPES differ ({'; '.join(diff)})")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        status, bad = "exact", None
        for i, (ra, rb) in enumerate(zip(srows, orows)):
            for j, (a, b) in enumerate(zip(ra, rb)):
                r = eq(a, b)
                if not r:
                    status, bad = False, (i, oc[j], a, b)
                    break
                if r == "tol":
                    status = "tol"
            if bad:
                break
        if status is False:
            i, c, a, b = bad
            print(f"FAIL {name}: row {i} col {c}: spark={a!r} oracle={b!r}")
            n_fail += 1
        else:
            extra = " (float-tol only)" if status == "tol" else ""
            print(f"PASS {name} ({len(srows)} rows){extra}")
            n_pass += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
