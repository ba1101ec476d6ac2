#!/usr/bin/env python3
"""Local oracle-SQL sanity checker: registers the sf parquet tables as
DuckDB views and runs SQL from stdin (or a file arg), printing row count
and the first rows. Lets us verify oracle SQL *before* committing, which
is the process gap that shipped the r02 d24 regression."""
import sys, duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
sql = open(sys.argv[2]).read() if len(sys.argv) > 2 else sys.stdin.read()
res = con.execute(sql)
rows = res.fetchall()
print(f"rows={len(rows)}")
for r in rows[:10]:
    print(r)
