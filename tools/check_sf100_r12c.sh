#!/usr/bin/env bash
# Round-12 sf100 completion campaign, part C: q_clean_pipeline (the
# composed cleaning gate, added after part B launched — a running bash
# script must not be edited in place). Same discipline as part B.
# usage: check_sf100_r12c.sh [sfDir] [outDir] [log]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100_r12b}
LOG=${3:-/tmp/check_sf100_r12c.log}
: > "$LOG"
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export GRAFT_VERIFY_PARTS=${GRAFT_VERIFY_PARTS:-32}

if [ ! -d "$OUT/q_clean_pipeline" ]; then
  echo "== dump q_clean_pipeline ($(date +%H:%M:%S))" | tee -a "$LOG"
  tools/run_main.sh graft.Verify "$SF" "$OUT" '' --only=q_clean_pipeline \
    >> "$LOG" 2>&1 || echo "!! dump rc=$?" | tee -a "$LOG"
fi
echo "== check q_clean_pipeline ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 14400 python3 tools/check_oracle.py "$SF" "$OUT" --only q_clean_pipeline \
  >> "$LOG" 2>&1 || echo "!! check rc=$?" | tee -a "$LOG"
echo "R12C DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -E "^OK|FAIL|!!" "$LOG" | head
exit 0
