#!/usr/bin/env bash
# q_ann_batch sf100 differential campaign: 10 x 1k-query chunks, each a
# FRESH JVM so one chunk's shuffle spill (blockmgr) is reclaimed at
# process exit — the whole-batch run died on spill-disk exhaustion
# (10k queries x 20M corpus x two plans vs 32 GB free). Query top-k's
# are mutually independent, so the chunk union IS the full check.
# Resumable: chunks already OK in the log are skipped.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
LOG=${2:-/tmp/check_annbatch_r11.log}
N=10
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-16}
for k in $(seq 0 $((N-1))); do
  if grep -q "OK chunk $k/$N" "$LOG" 2>/dev/null; then
    echo "== chunk $k/$N already OK, skipping"; continue
  fi
  echo "== chunk $k/$N ($(date +%H:%M:%S), $(df -h / | awk 'NR==2{print $4}') free)" | tee -a "$LOG"
  if tools/run_main.sh graft.AnnBatchCheck "$SF" $N $k >> "$LOG" 2>&1; then
    echo "OK chunk $k/$N" | tee -a "$LOG"
  else
    echo "!! chunk $k rc=$?" | tee -a "$LOG"
  fi
done
echo "ANN_BATCH CAMPAIGN DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -c "^OK chunk" "$LOG" | xargs echo "OK chunks:"
