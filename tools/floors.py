#!/usr/bin/env python3
"""Cross-check a BENCH/BASELINE sweep against docs/FLOORS.json and the
pair records (VERDICT r13 item 4): every comparable sweep row over the
bar must either (a) carry a current fresh-JVM pair record <= bar (the
pair protocol is the standing per-row evidence - sweeps share a JVM and
inherit ordering/host noise), (b) map to a FLOORS adjudication entry
(pinned plan shape, validated by PlanSpec on every tree), or (c) sit
under the absolute-gap attention bar (sub-1.5 s gaps on sub-second
DuckDB sides are Spark's fixed session/stage floor - the band the pair
table's common shape describes, not per-row findings).

Flags floor entries whose sweep ratio drifted >0.3x from the recorded
pair (the end-of-round re-pair trigger) and floor entries whose current
evidence clears the bar (retire them).

Pin validation is PlanSpec's job, not this gate's: the sf0.001 `pins`
block (require/forbid/count caps on the AQE-executed plan) and the
optional `sf10_pins` block (static plans against benchdata/sf10 — the
r17 machine check for scale-regime claims like q20/q44's shuffle-hash)
both re-validate on every test run.

Usage: tools/floors.py <bench.json> <baseline.json> [abpairs.json ...]
Exit 1 iff an unadjudicated row (ratio > bar, gap >= 1.5 s, no clearing
pair, no floor entry) exists.
"""
import sys, json, os

# structural exclusions (BASELINE.md): layout/ingest writes the oracle's
# plain read never pays; q58 — the one QUERY row here — times an eager
# bloom materialization scoping the runtime-filter confs while its oracle
# is the plain join without the mechanism; st33+ = streaming machinery
EXCLUDE = {"q39_bucketed_join", "q43_partition_prune", "q58_bloom_prefilter",
           "q67_schema_evolution", "q71_zorder_layout", "q74_corrupt_ingest"} | {
    f"st{n}_" for n in range(33, 49)}
MIN_GAP_S = 1.5

def is_excluded(k):
    return k in EXCLUDE or any(k.startswith(p) for p in EXCLUDE)

bench = json.load(open(sys.argv[1]))["queries"]
base = json.load(open(sys.argv[2]))["queries"]
fl = json.load(open(os.path.join(os.path.dirname(__file__), "..",
                                 "docs", "FLOORS.json")))
bar, floors = fl["bar"], fl["floors"]
pairs = {}  # key -> best (lowest-ratio) pair record across supplied files
def harvest(qmap):
    for k, rec in qmap.items():
        r = rec.get("ratio_min")
        if r and r > 0 and (k not in pairs or r < pairs[k]):
            pairs[k] = r
for p in sys.argv[3:]:
    d = json.load(open(p))
    harvest(d.get("queries", {}))
    for b in d.get("batches", {}).values():  # ABPAIRS_r12's nested shape
        harvest(b.get("queries", {}))

comp = sorted(k for k in set(bench) & set(base)
              if not is_excluded(k) and bench[k] > 0 and base[k] > 0)
bad, floor_band = [], 0
for k in comp:
    ratio, gap = bench[k] / base[k], bench[k] - base[k]
    if ratio <= bar:
        continue
    if k in pairs and pairs[k] <= bar:
        print(f"  pair-cleared {k}: sweep {ratio:.2f}x, pair {pairs[k]:.2f}x")
    # a FLOORS entry adjudicates only if (a) its recorded pair is itself
    # over the bar — an entry whose own pair clears is not a floor, the
    # row must clear via a current pair like any other — and (b) the
    # sweep hasn't blown out past the recorded floor (>2x the recorded
    # ratio AND an over-MIN_GAP gap is a regression, not host drift;
    # drift-only flags below stay advisory re-pair prompts)
    elif k in floors and floors[k]["pair"]["ratio"] > bar and \
            not (ratio > 2 * floors[k]["pair"]["ratio"] and gap >= MIN_GAP_S):
        rec = floors[k]["pair"]["ratio"]
        # drift is RELATIVE and UPWARD-only (r16): the old absolute 0.3x
        # window was 2% of a 14x row (pure duck-side noise on a 0.15 s
        # denominator) but 14% of a 2.2x row, and it fired when the sweep
        # read BETTER than the pair - which is not a staleness hazard (the
        # adjudication stays conservative; a retireable floor surfaces via
        # the pair-cleared harvest). Re-pair only when the sweep says the
        # recorded pair UNDERSTATES current cost by >30%.
        drift = " [RE-PAIR: sweep >30% worse than recorded pair]" \
            if (ratio - rec) / rec > 0.3 else ""
        print(f"  floor {k}: sweep {ratio:.2f}x (recorded pair {rec:.2f}x)"
              f"{drift}")
    # the floor band waives only sub-gap rows on sub-second DuckDB
    # sides (the documented session/stage-floor shape) — a >2x row on a
    # DuckDB side over a second is a real finding regardless of gap
    elif gap < MIN_GAP_S and base[k] < 1.0:
        floor_band += 1
    else:
        bad.append(k)
        print(f"  UNADJUDICATED {k}: {bench[k]:.2f} vs {base[k]:.2f} = "
              f"{ratio:.2f}x (gap {gap:.2f} s)")
for k in floors:
    if k in pairs and pairs[k] <= bar:
        print(f"  retire {k}: current pair {pairs[k]:.2f}x <= {bar}x")
print(f"{len([k for k in comp if bench[k] / base[k] > bar])} sweep rows over "
      f"{bar}x: {floor_band} in the sub-{MIN_GAP_S}s-gap floor band, "
      f"{len(bad)} unadjudicated")
sys.exit(1 if bad else 0)
