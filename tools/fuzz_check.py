#!/usr/bin/env python3
"""DuckDB replay for OracleFuzzSpec's generated query shapes.

Usage: python3 tools/fuzz_check.py <sfDir> <fuzzOut>

<fuzzOut> contains oracle_sql.json (name -> DuckDB SQL) and one parquet
dir per name with the Spark-side result. Comparison is the same
canonicalization as check_oracle.py (sort columns by name, rows by all
columns, exact cell compare). No gate log — fuzz shapes are ephemeral;
the spec asserts exit 0.

Exit codes: 0 all pass, 1 any fail, 2 environment missing (duckdb not
importable) — the spec treats 2 as 'cancel', not failure.
"""
import json, math, os, sys

try:
    import duckdb
except Exception:
    print("NO_DUCKDB")
    sys.exit(2)

SF = sys.argv[1]
OUT = sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "documents", "events"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def canon(df):
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].map(lambda x: isinstance(x, (list, tuple)) or
                     getattr(x, "ndim", 0) > 0).any():
            df[c] = df[c].map(lambda x: tuple(x) if x is not None else None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


npass = nfail = 0
for name, sql in sorted(oracle.items()):
    try:
        got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e}\n  sql: {sql}")
        nfail += 1
        continue
    g, w = canon(got), canon(want)
    if list(g.columns) != list(w.columns):
        print(f"FAIL {name}: columns {list(g.columns)} vs {list(w.columns)}\n  sql: {sql}")
        nfail += 1
    elif len(g) != len(w):
        print(f"FAIL {name}: rows {len(g)} vs {len(w)}\n  sql: {sql}")
        nfail += 1
    else:
        bad = []
        for c in g.columns:
            for i, (x, y) in enumerate(zip(g[c].tolist(), w[c].tolist())):
                if not cell_eq(x, y):
                    bad.append((c, i, x, y))
                    if len(bad) > 4:
                        break
            if len(bad) > 4:
                break
        if bad:
            print(f"FAIL {name}: cell diffs, first: {bad[:3]}\n  sql: {sql}")
            nfail += 1
        else:
            npass += 1

print(f"FUZZ {npass} pass, {nfail} fail, {len(oracle)} shapes")
sys.exit(1 if nfail else 0)
