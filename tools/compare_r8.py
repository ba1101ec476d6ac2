#!/usr/bin/env python3
"""Summarize a BENCH_*.json / BASELINE_*.json pair: raw totals, the
comparable-surface totals (structural rows excluded per BASELINE.md's
convention), win counts, and the worst comparable ratios.

Usage: tools/compare_r8.py <bench.json> <baseline.json>
"""
import sys, json

# structural exclusions (BASELINE.md): layout writes (q39/q43/q67/q71/q74
# time a bucketed/partitioned/evolved/quarantined WRITE the oracle's plain
# read never pays), q58 (times an eager bloom materialization that scopes
# the runtime-filter confs — the oracle is the plain join without the
# mechanism; the rewrite exists for the >10 GB regime where it removes a
# full-fact exchange), and st33+ streaming machinery (real micro-batch
# queries vs batch end-state restatements)
EXCLUDE = {"q39_bucketed_join", "q43_partition_prune", "q58_bloom_prefilter",
           "q67_schema_evolution", "q71_zorder_layout", "q74_corrupt_ingest"} | {
    f"st{n}_" for n in range(33, 49)}

def is_excluded(k):
    return k in EXCLUDE or any(k.startswith(p) for p in EXCLUDE)

bench = json.load(open(sys.argv[1]))["queries"]
base = json.load(open(sys.argv[2]))["queries"]
keys = sorted(set(bench) & set(base))
raw_s = sum(bench[k] for k in keys if bench[k] > 0)
raw_d = sum(base[k] for k in keys if base[k] > 0)
comp = [k for k in keys if not is_excluded(k) and bench[k] > 0 and base[k] > 0]
cs = sum(bench[k] for k in comp)
cd = sum(base[k] for k in comp)
wins = [k for k in comp if bench[k] < base[k]]
errs = [k for k in keys if bench[k] < 0 or base[k] < 0]
print(f"queries={len(keys)} raw spark={raw_s:.1f}s duck={raw_d:.1f}s "
      f"ratio={raw_s / raw_d:.2f}")
print(f"comparable({len(comp)}) spark={cs:.1f}s duck={cd:.1f}s "
      f"ratio={cs / cd:.2f}  wins={len(wins)} errors={errs}")
worst = sorted(comp, key=lambda k: bench[k] / base[k], reverse=True)[:10]
for k in worst:
    print(f"  {k}: {bench[k]:.2f} vs {base[k]:.2f} = {bench[k] / base[k]:.1f}x")
