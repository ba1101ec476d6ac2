#!/usr/bin/env python3
"""Measure the DuckDB baseline (BASELINE.md): run every oracle SQL from a
Verify output dir's oracle_sql.json on the sf parquet, 32 threads, min of
two timed passes after one warmup. Prints per-query seconds + total."""
import sys, json, time
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
oracle_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_r3c/oracle_sql.json"
con = duckdb.connect()
con.execute("SET threads TO 32")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
oracle = json.load(open(oracle_path))

def timed(sql):
    t0 = time.time()
    con.execute(sql).fetchall()
    return time.time() - t0

results = {}
for name in sorted(oracle):
    sql = oracle[name]
    try:
        timed(sql)                       # warmup
        results[name] = min(timed(sql), timed(sql))
    except Exception as e:
        results[name] = -1.0
        print(f"# {name} FAILED: {e}", file=sys.stderr)
total = sum(v for v in results.values() if v > 0)
print(json.dumps({"total_sec": round(total, 3),
  "queries": {k: round(v, 3) for k, v in results.items()}}, indent=1))
