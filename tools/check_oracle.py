#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify (Spark) over a testdata SF dir, then executes each
oracle SQL in DuckDB against the same parquet tables and compares
row-by-row (columns sorted by name, values stringified).

Usage: python3 tools/check_oracle.py [sfDir] [outDir] [--skip-verify]
"""
import json, os, subprocess, sys

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    cp = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(cp.stdout[-3000:])
    if cp.returncode != 0:
        sys.stderr.write(cp.stderr[-3000:])
        sys.exit(1)

import duckdb
con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        spark_rows = con.execute(
            f"SELECT * FROM read_parquet('{pdir}/*.parquet')").fetchdf()
        duck_rows = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    s = spark_rows[sorted(spark_rows.columns)]
    d = duck_rows[sorted(duck_rows.columns)]
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
        fails += 1
        continue
    sv = s.astype(str).values.tolist()
    dv = d.astype(str).values.tolist()
    if sv != dv:
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(sv, dv)) if a != b][:5]
        print(f"FAIL {name}: {len([1 for a,b in zip(sv,dv) if a!=b])} mismatched rows; first: {bad}")
        print(f"  spark dtypes: {dict(s.dtypes.astype(str))}")
        print(f"  duck  dtypes: {dict(d.dtypes.astype(str))}")
        fails += 1
        continue
    print(f"OK   {name}: {len(s)} rows")
print("RESULT:", "FAIL" if fails else "PASS", f"({len(oracle)-fails}/{len(oracle)})")
sys.exit(1 if fails else 0)
