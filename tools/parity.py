#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: compare each
Verify parquet dump against its DuckDB oracle SQL on the same tables.

Usage: python3 tools/parity.py [sfdir] [outdir]
"""
import json, math, sys
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        spark_df = con.execute(
            f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    except Exception as e:
        print(f"[MISSING-SPARK] {name}: {e}")
        fail += 1
        continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"[ORACLE-ERR] {name}: {e}")
        fail += 1
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    d = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(s.columns) != list(d.columns):
        print(f"[SCHEMA] {name}: spark={list(s.columns)} duck={list(d.columns)}")
        fail += 1
        continue
    if len(s) != len(d):
        print(f"[ROWS] {name}: spark={len(s)} duck={len(d)}")
        fail += 1
        continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    d = d.sort_values(by=list(d.columns)).reset_index(drop=True)
    mismatch = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv))
                   if not (a == b or (isinstance(a, float) and isinstance(b, float)
                                      and math.isnan(a) and math.isnan(b)))]
        else:
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b]
        if bad:
            i, a, b = bad[0]
            mismatch = f"col {c} row {i}: spark={a!r} duck={b!r} ({len(bad)} diffs)"
            break
    if mismatch:
        print(f"[VALUE] {name}: {mismatch}")
        fail += 1
    else:
        print(f"[OK] {name} ({len(s)} rows)")
        ok += 1
print(f"\n{ok} ok, {fail} fail, {len(oracle)} total")
sys.exit(1 if fail else 0)
