#!/usr/bin/env bash
# Run a graft main class from a STAGED jar copy, isolated from sbt's
# target/ directory — `sbt clean`/`compile` in the repo must not be able
# to yank classfiles out from under a long-running background campaign
# (that exact failure burned an 8-minute sf100 Verify pass).
#
# usage: run_main.sh <mainClass> [args...]
#   env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_CPUS (default 8)
set -euo pipefail
cd "$(dirname "$0")/.."
STAGE=/tmp/graft_stage
mkdir -p "$STAGE"
# stage only if the built jar is newer than the staged copy
JAR=target/scala-2.13/zingerspark_2.13-0.1.0.jar
if [ "$JAR" -nt "$STAGE/graft.jar" ]; then cp "$JAR" "$STAGE/graft.jar"; fi
MAIN=$1; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java -Xmx"${SPARK_DRIVER_MEM:-8g}" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$STAGE/graft.jar:/opt/spark/jars/*" "$MAIN" "$@"
