#!/usr/bin/env bash
# Round-11: the queued q_dedup_simhash sf100 chunked campaign (doc_id % 20,
# valid — row-per-doc, no cross-doc aggregation; see check_chunked.py
# header). One chunk per PROCESS (fresh DuckDB + pyarrow each time) with
# per-chunk resume, so an interrupt re-runs only the missing tail.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100}
LOG=${3:-/tmp/check_simhash_r11.log}
N=20
for k in $(seq 0 $((N-1))); do
  if grep -q "OK    q_dedup_simhash chunk $k/$N" "$LOG" 2>/dev/null; then
    echo "== chunk $k/$N already OK, skipping"; continue
  fi
  echo "== chunk $k/$N ($(date +%H:%M:%S), $(df -h / | awk 'NR==2{print $4}') free)" | tee -a "$LOG"
  python3 tools/check_chunked.py "$SF" "$OUT" q_dedup_simhash doc_id $N $k documents >> "$LOG" 2>&1 \
    || echo "!! chunk $k rc=$?" | tee -a "$LOG"
done
echo "SIMHASH CAMPAIGN DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -c "^OK" "$LOG" | xargs echo "OK chunks:"
