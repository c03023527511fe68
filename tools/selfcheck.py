#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify,
then compare each result parquet against the DuckDB oracle SQL.
Usage: python3 tools/selfcheck.py [sfdir] [outdir] [--skip-verify]
"""
import sys, os, json, subprocess, glob

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(["sbt", f'runMain graft.Verify {SF} {OUT}'],
                       capture_output=True, text=True, cwd="/root/repo")
    if r.returncode != 0:
        print(r.stdout[-4000:]); print(r.stderr[-4000:]); sys.exit(1)
    for line in r.stderr.splitlines():
        if "[verify]" in line: print(line)

import duckdb
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
# honor SPARK_GRAFT_ONLY on the COMPARE side too: a reused out dir may
# hold stale results from an earlier run at a different SF, and those
# must not masquerade as failures of the current subset
only = os.environ.get("SPARK_GRAFT_ONLY")
only_set = set(x.strip() for x in only.split(",")) if only else None
fail, ok, noorc = [], [], []
for name in sorted(os.listdir(OUT)):
    pdir = os.path.join(OUT, name)
    if not os.path.isdir(pdir):
        continue
    if only_set is not None and name not in only_set:
        continue
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        fail.append((name, "no parquet written")); continue
    got = con.execute(f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
    if name not in oracle:
        noorc.append((name, len(got))); continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fail.append((name, f"oracle SQL error: {e}")); continue
    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    if list(g.columns) != list(e.columns):
        fail.append((name, f"columns differ: got {list(g.columns)} vs oracle {list(e.columns)}")); continue
    if len(g) != len(e):
        fail.append((name, f"row count: got {len(g)} vs oracle {len(e)}")); continue
    g = g.sort_values(by=list(g.columns)).reset_index(drop=True)
    e = e.sort_values(by=list(e.columns)).reset_index(drop=True)
    try:
        import pandas as pd
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        ok.append(name)
    except AssertionError as ex:
        diffcols = []
        for c in g.columns:
            if not g[c].equals(e[c]):
                diffcols.append(c)
        fail.append((name, f"value mismatch in {diffcols}: {str(ex).splitlines()[-1][:200]}"))

print(f"\n=== PASS {len(ok)} : {ok}")
print(f"=== NO-ORACLE {len(noorc)} : {noorc}")
print(f"=== FAIL {len(fail)}")
for n, why in fail:
    print(f"  {n}: {why}")
sys.exit(1 if fail else 0)
