#!/usr/bin/env python3
"""Interleaved Spark/DuckDB A/B bench for headline rows (VERDICT r6 #3:
same-round sf1 measurements swung up to 5x between passes, so headline
ratios now come from an interleaved protocol instead of two monolithic
sweeps).

For each requested query key, alternately runs a fresh-JVM Spark Bench
pass (which itself warms up and takes min-of-2) and a DuckDB pass
(min-of-2 after warmup), ROUNDS times each, interleaved A/B/A/B so host
drift hits both engines equally. Reports per-round samples, min-of-rounds
for each side, the min-ratio, and each side's max/min spread — a row
whose spread exceeds 2x is flagged UNSTABLE and should not be quoted as
a headline number without more rounds.

Usage: tools/abbench.py <sfDir> <comma-keys> [rounds=3]
Needs: target/scala-2.13/classes compiled; oracle SQL is taken straight
from SparkEntry via a Verify dump if /tmp/abbench_oracle.json is absent.
"""
import sys, os, json, time, subprocess

sf = sys.argv[1]
keys = sys.argv[2].split(",")
rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

oracle_path = "/tmp/abbench_oracle.json"
if not os.path.exists(oracle_path):
    # dump oracle_sql.json without running any query (Verify with a key
    # that exists but on the smallest SF keeps this fast)
    out = "/tmp/abbench_verify"
    env = dict(os.environ, SPARK_GRAFT_ONLY=keys[0], SPARK_GRAFT_CPUS="4")
    subprocess.run([f"{repo}/tools/run.sh", "graft.Verify",
                    "/root/testdata/sf0.001", out],
                   env=env, capture_output=True, check=True)
    os.rename(f"{out}/oracle_sql.json", oracle_path)
oracle = json.load(open(oracle_path))

import duckdb


def duck_pass(key):
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    sql = oracle[key]

    def timed():
        t0 = time.time()
        con.execute(sql).fetchall()
        return time.time() - t0
    timed()  # warmup
    r = min(timed(), timed())
    con.close()
    return r


def spark_pass(key):
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf, SPARK_GRAFT_CPUS="32",
               SPARK_GRAFT_ONLY=key,
               SPARK_GRAFT_BENCH_OUT="/tmp/abbench_spark.json")
    subprocess.run([f"{repo}/tools/run.sh", "graft.Bench"],
                   env=env, capture_output=True, check=True)
    return json.load(open("/tmp/abbench_spark.json"))["queries"][key]


report = {}
for key in keys:
    if key not in oracle:
        print(f"# {key}: no oracle SQL, skipping", file=sys.stderr)
        continue
    sp, du = [], []
    for i in range(rounds):
        sp.append(spark_pass(key))
        du.append(duck_pass(key))
        print(f"# {key} round {i+1}: spark={sp[-1]:.3f}s duck={du[-1]:.3f}s",
              file=sys.stderr)
    spread_s = max(sp) / min(sp)
    spread_d = max(du) / min(du)
    report[key] = {
        "spark_rounds": [round(x, 3) for x in sp],
        "duck_rounds": [round(x, 3) for x in du],
        "spark_min": round(min(sp), 3),
        "duck_min": round(min(du), 3),
        "ratio_min": round(min(sp) / min(du), 3),
        "spark_spread": round(spread_s, 2),
        "duck_spread": round(spread_d, 2),
        "stable": spread_s < 2.0 and spread_d < 2.0,
    }
print(json.dumps({"sf": sf, "rounds": rounds, "queries": report}, indent=1))
