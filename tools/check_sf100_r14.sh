#!/usr/bin/env bash
# Round-14 sf100 re-verification for the gates whose code or oracle
# changed this round: q_sample (two-phase bucketed stratified rank),
# q_html_strip (quote-aware tag regex + planted attr dirt),
# q_etl_stateless / q_etl_denorm (array-path octave exclusive bases),
# q_clean_pipeline (stripHtml change + new dirt — dumped here, verified
# by the two-pass check_span_sf100.sh campaign; its one-shot oracle OOMs
# at sf100). Family chunks in FRESH JVMs (run_sf100.sh discipline),
# fresh-process DuckDB checks afterward.
#
# usage: check_sf100_r14.sh [sfDir] [outDir] [log]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100_r14}
LOG=${3:-/tmp/check_sf100_r14.log}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export GRAFT_VERIFY_PARTS=${GRAFT_VERIFY_PARTS:-32}
: > "$LOG"

chunks=(
  "q_html_strip,q_sample"
  "q_etl_stateless,q_etl_denorm"
  "q_clean_pipeline"
)
for c in "${chunks[@]}"; do
  first=${c%%,*}
  if [ -d "$OUT/$first" ]; then
    echo "== chunk $c cached" | tee -a "$LOG"; continue
  fi
  echo "== chunk $c ($(date +%H:%M:%S))" | tee -a "$LOG"
  tools/run_main.sh graft.Verify "$SF" "$OUT" none "--only=$c" >> "$LOG" 2>&1 \
    || { echo "!! chunk $c failed" | tee -a "$LOG"; exit 1; }
done
echo "DUMPS DONE ($(date +%H:%M:%S))" | tee -a "$LOG"

ck() { # one gate per fresh python process
  echo "== check --only=$1 ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 7200 python3 tools/check_oracle.py "$SF" "$OUT" --only "$1" >> "$LOG" 2>&1 \
    || echo "!! $1 rc=$?" | tee -a "$LOG"
}
ck q_html_strip
ck q_sample
ck q_etl_stateless
ck q_etl_denorm
echo "DIRECT CHECKS DONE ($(date +%H:%M:%S)) — run check_span_sf100.sh for q_clean_pipeline" | tee -a "$LOG"
