#!/bin/bash
# Interleaved same-host full-Bench A/B between two source trees (VERDICT r18
# "Next round #1"): alternate fresh-JVM graft.Bench runs of tree A and tree B
# at the same SF/core count so host drift hits both trees equally. Each run's
# full 147-key map lands in its own JSON file; totals print as they land.
#
# Usage: tools/ab_trees.sh <treeA> <treeB> <sfDir> <cpus> <rounds> <outPrefix>
# Example:
#   tools/ab_trees.sh /root/r17tree /root/repo /root/testdata/sf0.1 32 2 /tmp/ab
set -e
A=$1; B=$2; SF=$3; CPUS=$4; ROUNDS=$5; OUT=$6
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
run_one() { # $1 tree, $2 outfile
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS="$CPUS" SPARK_GRAFT_BENCH_OUT="$2" \
  java $ADD_OPENS -Xmx${SPARK_DRIVER_MEM:-32g} \
    -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
    -cp "$1/target/scala-2.13/classes:/opt/spark/jars/*" graft.Bench \
    > "$2.stdout" 2>&1
  python3 -c "import json,sys; d=json.load(open('$2')); print('$2 total=%.1f s, %d keys, errors=%d' % (d['value'], len(d['queries']), len(d.get('errors',{}))))"
}
for i in $(seq 1 "$ROUNDS"); do
  echo "== round $i tree A ($A) $(date +%H:%M:%S)"
  run_one "$A" "${OUT}_A_$i.json"
  echo "== round $i tree B ($B) $(date +%H:%M:%S)"
  run_one "$B" "${OUT}_B_$i.json"
done
echo "done $(date +%H:%M:%S)"
