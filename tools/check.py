#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir]
  1. (caller runs Verify first: sbt "runMain graft.Verify <sfdir> <outdir>")
  2. registers each testdata parquet as a DuckDB view
  3. runs every oracle_sql.json query, compares against the Spark parquet dump:
     columns sorted by name, rows sorted, exact value match (floats: repr).

This is builder-side tooling only — engine code never depends on it.
"""
import json, sys, glob, os
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output");  fail += 1;  continue
    try:
        got = con.sql(f"SELECT * FROM read_parquet('{files[0]}')").fetchdf()
        want = con.sql(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}");  fail += 1;  continue
    got = got.reindex(sorted(got.columns), axis=1)
    want = want.reindex(sorted(want.columns), axis=1)
    if list(got.columns) != list(want.columns):
        print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}")
        fail += 1;  continue
    def norm(df):
        return sorted(tuple(repr(v) for v in row) for row in df.itertuples(index=False))
    g, w = norm(got), norm(want)
    if len(g) != len(w):
        print(f"FAIL {name}: rowcount {len(g)} vs {len(w)}");  fail += 1;  continue
    if g != w:
        diff = [i for i, (a, b) in enumerate(zip(g, w)) if a != b][:3]
        print(f"FAIL {name}: value mismatch at sorted rows {diff}")
        for i in diff[:1]:
            print(f"   spark: {g[i]}\n   duck : {w[i]}")
        fail += 1;  continue
    print(f"OK   {name} ({len(g)} rows)")
    ok += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
