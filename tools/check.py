#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads outDir/<name>/ parquet (written by graft.Verify) and
outDir/oracle_sql.json, runs each oracle SQL in DuckDB over views named
after the parquet tables in sfDir, then compares: sort columns by name,
sort rows, compare values. Reports per-query match/mismatch.
"""
import sys, json, glob, math

import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails.append(name)
        continue
    try:
        got = pd.concat(
            [pd.read_parquet(f) for f in sorted(glob.glob(f"{out}/{name}/*.parquet"))],
            ignore_index=True)
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        fails.append(name)
        continue

    def norm(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        df = df.sort_values(by=list(df.columns), ignore_index=True)
        return df

    e_n, g_n = norm(exp), norm(got)
    if list(e_n.columns) != list(g_n.columns):
        print(f"FAIL {name}: columns exp={list(e_n.columns)} got={list(g_n.columns)}")
        fails.append(name)
        continue
    if len(e_n) != len(g_n):
        print(f"FAIL {name}: rows exp={len(e_n)} got={len(g_n)}")
        fails.append(name)
        continue
    ok = True
    for c in e_n.columns:
        a, b = e_n[c], g_n[c]
        # Dtype-strict: the driver hashes values as-typed, so a DuckDB
        # HUGEINT surfacing as float64 against a Spark int64 column is a
        # real mismatch (hash sees 99111.0 vs 99111) even though the
        # numeric values agree. Reproduce that verdict here instead of
        # silently coercing. (Round-5 judge finding #2.)
        kinds = {a.dtype.kind, b.dtype.kind}
        if "f" in kinds and kinds & {"i", "u"}:
            print(f"FAIL {name}: col {c} dtype drift: exp={a.dtype} got={b.dtype} "
                  f"(cast the oracle sum to BIGINT)")
            ok = False
            fails.append(name)
            break
        try:
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                bad = ~((a == b) | (a.isna() & b.isna()))
            else:
                bad = ~((a.astype(str) == b.astype(str)))
        except Exception:
            bad = pd.Series([True] * len(a))
        if bad.any():
            i = bad.idxmax()
            print(f"FAIL {name}: col {c} row {i}: exp={a[i]!r} got={b[i]!r} "
                  f"({int(bad.sum())} diffs)")
            ok = False
            fails.append(name)
            break
    if ok:
        print(f"OK   {name}: {len(e_n)} rows")

print(f"\n{len(oracle) - len(set(fails))}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
