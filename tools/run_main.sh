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
# stage to a UNIQUE path per invocation: overwriting a shared staged jar
# truncates the inode a still-running JVM has open (lazy classloading
# reads would see a corrupt zip mid-run)
JAR=target/scala-2.13/zingerspark_2.13-0.1.0.jar
STAGED="$STAGE/graft-$$-$(date +%s).jar"
cp "$JAR" "$STAGED"
trap 'rm -f "$STAGED"' EXIT
# stale copies from crashed runs (best effort; in-use files survive rm)
find "$STAGE" -name 'graft-*.jar' -mmin +360 -delete 2>/dev/null || true
MAIN=$1; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
# no exec: the EXIT trap must run to reap the staged copy
java -Xmx"${SPARK_DRIVER_MEM:-8g}" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$STAGED:/opt/spark/jars/*" "$MAIN" "$@"
