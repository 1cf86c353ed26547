#!/usr/bin/env bash
# q_dedup_simhash sf100 campaign, two-stage (see check_simhash_sf100_v2.py):
#   0. SimhashSigDump writes the per-doc signatures + sig-stage oracle SQL
#      (skipped if already present).
#   1. Stage A: N doc_id-modulus chunks, each a FRESH python/DuckDB process
#      (resume via log), verifying the signatures against the pure-SQL
#      XXH64 oracle — valid chunking, the sigs are row-per-doc.
#   2. Stage B: one process re-derives the full pair set from the verified
#      signatures (cheap BIGINT) and compares to the gate's sf100 dump.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
GATEOUT=${2:-/tmp/verify_sf100}
SIGDIR=${3:-/tmp/simhash_sigs_sf100}
LOG=${4:-/tmp/check_simhash_r12.log}
N=20
if [ ! -f "$SIGDIR/simhash_sig_oracle.sql" ]; then
  echo "== sig dump ($(date +%H:%M:%S))" | tee -a "$LOG"
  SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-32g} \
    tools/run_main.sh graft.ml.SimhashSigDump "$SF" "$SIGDIR" >> "$LOG" 2>&1 \
    || { echo "!! sig dump failed rc=$?" | tee -a "$LOG"; exit 1; }
fi
for k in $(seq 0 $((N-1))); do
  if grep -q "OK    simhash sigs chunk $k/$N" "$LOG" 2>/dev/null; then
    echo "== sig chunk $k/$N already OK, skipping"; continue
  fi
  echo "== sig chunk $k/$N ($(date +%H:%M:%S), $(df -h / | awk 'NR==2{print $4}') free)" | tee -a "$LOG"
  python3 tools/check_simhash_sf100_v2.py siga "$SF" "$SIGDIR" $N $k >> "$LOG" 2>&1 \
    || echo "!! sig chunk $k rc=$?" | tee -a "$LOG"
done
if [ "$(grep -c 'OK    simhash sigs chunk' "$LOG")" -ne $N ]; then
  echo "SIMHASH CAMPAIGN INCOMPLETE: stage A not all green, skipping stage B" | tee -a "$LOG"
  exit 1
fi
if ! grep -q "OK    simhash pairs" "$LOG" 2>/dev/null; then
  echo "== stage B pairs ($(date +%H:%M:%S))" | tee -a "$LOG"
  python3 tools/check_simhash_sf100_v2.py pairs "$SIGDIR" "$GATEOUT" 6 >> "$LOG" 2>&1 \
    || echo "!! stage B rc=$?" | tee -a "$LOG"
fi
echo "SIMHASH CAMPAIGN DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -c "^OK" "$LOG" | xargs echo "OK lines:"
