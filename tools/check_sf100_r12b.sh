#!/usr/bin/env bash
# Round-12 sf100 completion campaign, part B: the gates added after the
# main campaign closed — the corpus-cleaning quartet (q_line_dedup,
# q_html_strip, q_url_domain, q_unicode_norm) and the two new ANN tiers
# (q_ann_ivfpq, q_ann_sq — self-verifying recall gates; the sf100 verdict
# is the in-plan recall floor holding at 2M vectors). Same discipline as
# check_sf100.sh / check_sf100_r10.sh: fresh JVM per dump family with
# per-gate resume, fresh python process per check, cheap -> expensive.
#
# usage: check_sf100_r12b.sh [sfDir] [outDir] [log]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100_r12b}
LOG=${3:-/tmp/check_sf100_r12b.log}
: > "$LOG"
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export GRAFT_VERIFY_PARTS=${GRAFT_VERIFY_PARTS:-32}

dump() { # comma-list of gates; per-gate resume like run_sf100.sh
  IFS=',' read -ra gs <<< "$1"
  todo=""
  for g in "${gs[@]}"; do
    [ -d "$OUT/$g" ] || todo="${todo:+$todo,}$g"
  done
  if [ -z "$todo" ]; then echo "== dump $1 already present" | tee -a "$LOG"; return; fi
  echo "== dump $todo ($(date +%H:%M:%S), $(df -h / | awk 'NR==2{print $4}') free)" | tee -a "$LOG"
  tools/run_main.sh graft.Verify "$SF" "$OUT" '' "--only=$todo" \
    >> "$LOG" 2>&1 || echo "!! dump $todo rc=$?" | tee -a "$LOG"
}
ck() {
  echo "== check --only=$1 ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 7200 python3 tools/check_oracle.py "$SF" "$OUT" --only "$1" >> "$LOG" 2>&1 \
    || echo "!! $1 rc=$?" | tee -a "$LOG"
}

dump q_url_domain,q_unicode_norm,q_html_strip,q_line_dedup
dump q_span_dedup
dump q_ann_sq
dump q_ann_ivfpq

ck q_url_domain
ck q_ann_sq
ck q_ann_ivfpq
ck q_unicode_norm
ck q_html_strip
ck q_line_dedup
ck q_span_dedup

echo "R12B DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -cE "^OK" "$LOG" | xargs echo "OK lines:"
grep -E "FAIL|!!" "$LOG" | head -20
exit 0
