#!/usr/bin/env python3
"""Paired DuckDB re-measure for the bench suite (VERDICT r7 #1).

BASELINE.md's DuckDB numbers were measured 2026-08-12 in an earlier
container; the container floor drifts between rounds (SCALE.md §11:
+15% on DuckDB's own Q02 re-measure), so a ratio against the frozen
baseline is cross-environment. This tool re-runs the SAME suite under
the SAME protocol (in-memory DB, views over the same parquet files,
warm process, one full warm-up pass, median of 3 consecutive runs per
query, wall-clock around execute+fetchall) in the CURRENT container,
so Bench can emit a paired, apples-to-apples ratio next to the
historical one. BASELINE.md stays the historical anchor; the paired
ratio is the gate.

Usage: python3 tools/rebaseline.py <sfDir> <oracleSqlJson> [prefix]
  <oracleSqlJson>: {name: duckdb_sql} (Bench dumps SparkEntry.oracleSql)
  [prefix]: which names to run (default "q" = the BASELINE.md suite)

Prints ONE JSON line: {"duckdb_total": sec, "queries": {name: sec}}
"""
import sys, json, time, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, sql_json = sys.argv[1], sys.argv[2]
    prefix = sys.argv[3] if len(sys.argv) > 3 else "q"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if not os.path.exists(p):
            continue
        src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")
    oracle = json.load(open(sql_json))
    names = sorted(n for n in oracle if n.startswith(prefix))
    for n in names:                      # warm-up pass (protocol)
        con.execute(oracle[n]).fetchall()
    qs = {}
    for n in names:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            con.execute(oracle[n]).fetchall()
            ts.append(time.perf_counter() - t0)
        qs[n] = sorted(ts)[1]
    print(json.dumps({"duckdb_total": round(sum(qs.values()), 4),
                      "queries": {k: round(v, 4) for k, v in qs.items()}}))


if __name__ == "__main__":
    main()
