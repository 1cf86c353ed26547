#!/usr/bin/env bash
# Round-10 sf100 completion campaign, part A: the gates round 9 dumped but
# never oracle-checked (checker-process OOM rc=137, oracle OOM, or clock),
# plus re-checks of the gates round 10 re-dumped after code changes
# (q_etl_* new renumber plan, q_pack/q_shuffle_order native searchSorted,
# q_stream_window/q_session_window exact decimal sums, q_multimodal_resize
# new gate). One FRESH python process per check (the sf10/sf100 lesson:
# long multi-gate checker processes exhaust memory and produce false
# FAILs); cheap -> expensive so a cutoff leaves a maximal verified set.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100}
LOG=${3:-/tmp/check_sf100_r10.log}
: > "$LOG"

ck() {
  echo "== check --only=$1 ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 3600 python3 tools/check_oracle.py "$SF" "$OUT" --only "$1" >> "$LOG" 2>&1 \
    || echo "!! $1 rc=$?" | tee -a "$LOG"
}
chunked() { # gate keyCol nchunks baseTable [outCol]
  echo "== chunked $1 on $2 %$3 of ${4:-documents} ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 7200 python3 tools/check_chunked.py "$SF" "$OUT" "$1" "$2" "$3" - "${4:-documents}" ${5:-} >> "$LOG" 2>&1 \
    || echo "!! chunked $1 rc=$?" | tee -a "$LOG"
}
chunk1() { # gate keyCol nchunks chunk baseTable — resume a partial run
  echo "== chunk $4/$3 of $1 ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 7200 python3 tools/check_chunked.py "$SF" "$OUT" "$1" "$2" "$3" "$4" "$5" >> "$LOG" 2>&1 \
    || echo "!! chunk $4 of $1 rc=$?" | tee -a "$LOG"
}

# --- r10 re-dumped gates (small or medium outputs) ------------------------
ck q_etl_stateless
ck q_etl_denorm
ck q_stream_window
ck q_multimodal_resize

# --- the rc=137 family, solo this time (dumps are r9's except pack/shuffle,
#     re-dumped r10) ---------------------------------------------------------
ck q_dedup_bloom
ck q_pack
ck q_shuffle_order
ck q_dedup_simhash
ck q_repetition

# --- q_txn_bundle: one-shot oracle OOMs (ordered string_agg per txn is
#     non-spillable); row-per-txn with no cross-txn aggregation -> chunked
#     on user_id (== txn), same validity argument as q_collect ------------
chunked q_txn_bundle user_id 10 events txn

# --- q_inner_join: resume chunks 15-19 (r9 verified 0-14) -----------------
for k in 15 16 17 18 19; do chunk1 q_inner_join o_orderkey 20 "$k" orders; done

echo "PART A DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -cE "^OK" "$LOG" | xargs echo "OK lines:"
grep -E "FAIL|!!" "$LOG" | head -20
