#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against the DuckDB oracle and diff. Usage:
  python3 tools/compare.py <sfDir> <outDir> [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize cell values
    def cell(v):
        if isinstance(v, (list, np.ndarray)):
            return tuple(cell(x) for x in v)
        if isinstance(v, float):
            return None if np.isnan(v) else float(v)
        return v
    rows = [tuple(cell(v) for v in row) for row in df.itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple(str(x) for x in r)), list(df.columns)

fails = []
present = {n for n in os.listdir(outdir) if os.path.isdir(os.path.join(outdir, n))}
expected = set(oracle)
allq = os.path.join(outdir, "all_queries.json")
if os.path.exists(allq):
    expected |= set(json.load(open(allq)))  # rows-only queries too
for name in sorted(expected - present):
    if not only or name in only:
        print(f"{name:28s} MISSING-OUTPUT"); fails.append(name)
for name in sorted(present):
    d = os.path.join(outdir, name)
    if only and name not in only:
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")],
                         ignore_index=True) if glob.glob(f"{d}/*.parquet") else None
    if spark_df is None:
        print(f"{name:28s} NO-OUTPUT"); fails.append(name); continue
    if name not in oracle:
        print(f"{name:28s} rows-only: {len(spark_df)} rows")
        if len(spark_df) == 0: fails.append(name)
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name:28s} ORACLE-SQL-ERROR: {e}"); fails.append(name); continue
    srows, scols = canon(spark_df)
    drows, dcols = canon(duck_df)
    if scols != dcols:
        print(f"{name:28s} COLS-MISMATCH spark={scols} duck={dcols}"); fails.append(name); continue
    if len(srows) != len(drows):
        print(f"{name:28s} ROWCOUNT spark={len(srows)} duck={len(drows)}"); fails.append(name); continue
    bad = None
    for i, (a, b) in enumerate(zip(srows, drows)):
        if a != b:
            # tolerate tiny float diffs for diagnosis, but report
            bad = (i, a, b); break
    if bad:
        print(f"{name:28s} VALUE-MISMATCH row {bad[0]}\n  spark={bad[1]}\n  duck ={bad[2]}")
        fails.append(name)
    else:
        # dtype check (informational)
        dt_s = {c: str(spark_df[c].dtype) for c in spark_df.columns}
        dt_d = {c: str(duck_df[c].dtype) for c in duck_df.columns}
        note = "" if dt_s == dt_d else f"  [dtypes differ: spark={dt_s} duck={dt_d}]"
        print(f"{name:28s} OK ({len(srows)} rows){note}")

print(f"\n{len(fails)} failing: {fails}" if fails else "\nALL MATCH")
sys.exit(1 if fails else 0)
