#!/usr/bin/env bash
# Interleaved A/B gate profiling on a noisy box: alternate fresh-JVM
# QueryProfile runs between two jars (A = baseline, B = candidate) so
# ambient drift hits both variants equally; report per-variant exec
# medians. Usage:
#   ab_profile.sh <gate> <jarA> <jarB> [reps=5] [sfDir] [runsPerJvm=3]
# env: SPARK_GRAFT_CPUS (default 32), GRAFT_PROFILE_COLD=1 recommended.
set -euo pipefail
cd "$(dirname "$0")/.."
GATE=$1; JARA=$2; JARB=$3; REPS=${4:-5}; SF=${5:-/root/testdata/sf0.1}; RUNS=${6:-3}
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
run_one() { # $1=jar $2=tag
  # extract the per-run TOTAL (build + plan + exec), the bench-comparable
  # number: a gate whose construction is side-effecting (primed persists)
  # does real work in the build phase, so exec alone would under-count it
  java -Xmx8g $ADD_OPENS -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC \
    -cp "$1:/opt/spark/jars/*" graft.QueryProfile "$GATE" "$SF" "$RUNS" 2>/dev/null |
    sed -n "s/^== run [0-9]*: $GATE \([0-9.]*\) s .*/\1/p" |
    while read -r v; do echo "$2 $v"; done
}
OUT=$(mktemp)
for i in $(seq "$REPS"); do
  run_one "$JARA" A >> "$OUT"
  run_one "$JARB" B >> "$OUT"
done
for t in A B; do
  grep "^$t " "$OUT" | awk '{print $2}' | sort -n |
    awk -v t=$t '{v[NR]=$1} END{printf "%s n=%d min=%.3f med=%.3f max=%.3f\n", t, NR, v[1], v[int((NR+1)/2)], v[NR]}'
done
echo "raw samples in $OUT"
