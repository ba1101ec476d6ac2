#!/bin/bash
# Package-boundary smoke against the PUBLISHED jar (no target/classes):
#   sbt -batch package && tools/extsmoke.sh [sfDir]
# Compiles tools/extsmoke/ExtMain.scala with only the jar + spark jars on
# the classpath, then runs it the way a spark-submit user would reach the
# engine: session built from --conf spark.sql.extensions=graft.GraftExtensions.
set -e
cd "$(dirname "$0")/.."
JAR=target/scala-2.13/appealsdataspark_2.13-0.1.0.jar
[ -f "$JAR" ] || { echo "missing $JAR — run: sbt -batch package"; exit 1; }
OUT=/tmp/extsmoke_classes
rm -rf "$OUT" && mkdir -p "$OUT"
java -cp "/opt/spark/jars/*" scala.tools.nsc.Main \
  -classpath "$JAR:/opt/spark/jars/*" -d "$OUT" tools/extsmoke/ExtMain.scala
ADD_OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke java.base/java.lang.reflect \
         java.base/java.io java.base/java.net java.base/java.nio java.base/java.util \
         java.base/java.util.concurrent java.base/java.util.concurrent.atomic \
         java.base/sun.nio.ch java.base/sun.nio.cs java.base/sun.security.action \
         java.base/sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens $p=ALL-UNNAMED"
done
exec java $ADD_OPENS -Xmx8g -Dspark.ui.enabled=false \
  -cp "$OUT:$JAR:/opt/spark/jars/*" extuser.ExtMain "$@"
