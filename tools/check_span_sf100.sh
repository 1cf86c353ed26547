#!/usr/bin/env bash
# sf100 two-pass span-dedup campaign (part D): the one-shot DuckDB oracle
# for q_span_dedup / q_clean_pipeline OOMs at sf100 (450M-row string-keyed
# window); check_span_sf100.py evaluates the same semantics in exactly-
# partitionable passes — span classes by md5 bucket (pass 1), docs by
# modulus (pass 2) — one fresh python process per chunk. Resumable: pass-1
# chunks skip if their parquet exists; pass-2 chunks append OK lines.
#
# usage: check_span_sf100.sh [sfDir] [dumpDir] [workDir] [log]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
DUMP=${2:-/tmp/verify_sf100_r12b}
WORK=${3:-/tmp/spanwork_sf100}
LOG=${4:-/tmp/check_span_sf100.log}
M=${M:-6}
N=${N:-8}
GATES=${GATES:-"q_span_dedup q_clean_pipeline"}
mkdir -p "$WORK"
: > "$LOG"

for gate in $GATES; do
  if [ ! -d "$DUMP/$gate" ]; then
    echo "!! $gate dump missing in $DUMP — dump it first" | tee -a "$LOG"
    continue
  fi
  for ((m=0; m<M; m++)); do
    if [ -s "$WORK/dropped_${gate}_${m}.parquet" ]; then
      echo "== $gate dropped $m/$M cached" | tee -a "$LOG"; continue
    fi
    echo "== $gate dropped $m/$M ($(date +%H:%M:%S))" | tee -a "$LOG"
    timeout 7200 python3 tools/check_span_sf100.py dropped "$SF" "$WORK" "$gate" "$M" "$m" \
      >> "$LOG" 2>&1 || { echo "!! $gate dropped $m rc=$?" | tee -a "$LOG"; exit 1; }
  done
  for ((n=0; n<N; n++)); do
    echo "== $gate verify $n/$N ($(date +%H:%M:%S))" | tee -a "$LOG"
    timeout 7200 python3 tools/check_span_sf100.py verify "$SF" "$DUMP" "$WORK" "$gate" "$N" "$n" \
      >> "$LOG" 2>&1 || { echo "!! $gate verify $n rc=$?" | tee -a "$LOG"; exit 1; }
  done
done
echo "SPAN CAMPAIGN DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -cE "^OK" "$LOG" | xargs echo "OK lines:"
exit 0
