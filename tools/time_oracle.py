#!/usr/bin/env python3
"""Commit-able DuckDB oracle denominator for the bench ratio.

Runs every oracle SQL from a Verify dump against the sf parquet tables,
min-of-2 per query (the suite is noisy: the recursive-CTE chains swing
3x back-to-back — NOTES), and writes a FLAT json object the Scala Bench
can parse with a regex (no JSON lib on the engine classpath):

  {"_sf":"/root/testdata/sf0.1","_total_min2_sec":126.6,
   "q01_scan_project":0.012, ...}

Usage:
  python3 tools/time_oracle.py <sfDir> <oracle_sql.json> [outFile]

Regenerate oracle_sql.json without a full Verify run:
  sbt "runMain graft.Verify /root/testdata/sf0.1 /tmp/sqldump __none__"
(the per-query filter skips every query but the SQL dump is unconditional).

Committed as ORACLE_TIMES.json at the repo root; Bench reads it from cwd
and emits ratio_aggregate / ratio_heavy_subset next to isolated_sec so
the denominator ships in the artifact the driver records.
"""
import sys, os, json, glob, time, gc

import duckdb


def main():
    sfdir = sys.argv[1]
    oracle_path = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else "ORACLE_TIMES.json"
    oracle = json.load(open(oracle_path))

    def fresh_con():
        con = duckdb.connect()
        for p in glob.glob(f"{sfdir}/*.parquet"):
            con.execute(
                f"CREATE VIEW {os.path.basename(p)[:-8]} AS SELECT * FROM '{p}'")
        return con

    con = fresh_con()
    times = {}
    # warm-up pass (OS page cache for the parquet files), then 2 timed
    for name in sorted(oracle):
        try:
            con.execute(oracle[name]).fetchall()
        except Exception as e:
            print(f"{name:28s} ORACLE-ERROR {e}", file=sys.stderr)
            times[name] = -1.0
    for name in sorted(oracle):
        if times.get(name, 0) < 0:
            continue
        runs = []
        for _ in range(2):
            gc.collect()
            t0 = time.perf_counter()
            con.execute(oracle[name]).fetchall()
            runs.append(time.perf_counter() - t0)
        times[name] = round(min(runs), 4)
        print(f"{name:28s} min2={times[name]:.3f}  runs=" +
              ",".join(f"{r:.3f}" for r in runs))

    ok = {k: v for k, v in times.items() if v >= 0}
    body = {"_sf": sfdir, "_n_queries": len(ok),
            "_total_min2_sec": round(sum(ok.values()), 2)}
    body.update({k: times[k] for k in sorted(times)})
    with open(out, "w") as f:
        json.dump(body, f, indent=0)
        f.write("\n")
    print(f"\nwrote {out}: {len(ok)} queries, total {body['_total_min2_sec']} s")


if __name__ == "__main__":
    main()
