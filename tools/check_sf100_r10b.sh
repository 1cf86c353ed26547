#!/usr/bin/env bash
# Round-10 sf100 completion campaign, part B: the never-checked tier-4
# giants (>=90M-row outputs), chunked by row key — validity: each gate is
# row-per-key with no cross-key aggregation, so verifying each
# `key % n == k` slice with the same oracle over a filtered base table is
# exactly the full check, partitioned (tools/check_chunked.py header).
# Ordered cheapest-first (events-projection gates, then the joins, then
# the 600M-row lineitem yield) so a wall-clock cutoff still leaves a
# maximal verified set; anything unfinished is listed as such in
# BENCHNOTES, never claimed.
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100}
LOG=${3:-/tmp/check_sf100_r10b.log}
: > "$LOG"

chunked() { # gate keyCol nchunks baseTable [outCol]
  echo "== chunked $1 on $2 %$3 of ${4:-documents} ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 10800 python3 tools/check_chunked.py "$SF" "$OUT" "$1" "$2" "$3" - "${4:-documents}" ${5:-} >> "$LOG" 2>&1 \
    || echo "!! chunked $1 rc=$?" | tee -a "$LOG"
}

# q_dedup_bloom, re-dumped with cardinality-scaled filter sizing (the
# sf100 scale catch: the fixed 1M-item filter saturated at a 2.5M-item
# history and broke the 2% FPR bound)
echo "== check --only=q_dedup_bloom ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 3600 python3 tools/check_oracle.py "$SF" "$OUT" --only q_dedup_bloom >> "$LOG" 2>&1 \
  || echo "!! q_dedup_bloom rc=$?" | tee -a "$LOG"

# simhash is row-per-doc; its one-shot oracle (HUGEINT bit-count sums over
# 5M docs) exceeds the box's free DISK as DuckDB spill — same class as
# q_rolling_fingerprint, same chunked remedy
chunked q_dedup_simhash doc_id 20
chunked q_switch event_id 10 events
chunked q_variant event_id 10 events
chunked q_withfield user_id 10 events
chunked q_envelope event_id 10 events offset
chunked q_offset_assign event_id 10 events
chunked q_session_window user_id 10 events
chunked q_codec_avro event_id 10 events
chunked q_codec_connect event_id 10 events
chunked q_connect_json event_id 10 events
chunked q_anti_join o_orderkey 20 orders
chunked q_fuse id 10 "documents:doc_id,events:event_id"
chunked q_yield l_orderkey 40 lineitem

echo "PART B DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -cE "^OK" "$LOG" | xargs echo "OK lines:"
grep -E "FAIL|!!" "$LOG" | head -20
