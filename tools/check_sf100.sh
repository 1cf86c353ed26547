#!/usr/bin/env bash
# sf100 oracle campaign: DuckDB-verify the Verify dump, one FRESH python
# process per family (the sf10 lessons: co-residency with a big Spark JVM
# and long multi-gate processes both produce false FAILs), ordered
# cheap -> expensive so a wall-clock cutoff still leaves a maximal verified
# set. Giant outputs (>=50M rows) go through check_chunked.py — valid only
# for row-per-key gates; each line below names the chunk key.
#
# Special-cased gates (same discipline as the sf10 campaign):
#  - q_dedup_minhash  -> check_minhash_sf100.py (all-pairs oracle intractable)
#  - q_ann_batch      -> AnnBatchCheck (Spark plan-vs-plan; 2G-cosine oracle)
#  - q_rolling_fingerprint -> chunked (HUGEINT intermediate can't one-shot)
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100}
LOG=${3:-/tmp/check_sf100.log}
: > "$LOG"

ck() { # family via check_oracle --only
  echo "== check --only=$1 ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 3600 python3 tools/check_oracle.py "$SF" "$OUT" --only "$1" >> "$LOG" 2>&1 \
    || echo "!! family $1 rc=$?" | tee -a "$LOG"
}
chunked() { # gate keyCol nchunks baseTable [outCol]
  echo "== chunked $1 on $2 %$3 of ${4:-documents} ($(date +%H:%M:%S))" | tee -a "$LOG"
  timeout 7200 python3 tools/check_chunked.py "$SF" "$OUT" "$1" "$2" "$3" - "${4:-documents}" ${5:-} >> "$LOG" 2>&1 \
    || echo "!! chunked $1 rc=$?" | tee -a "$LOG"
}

# --- tier 1: small outputs, cheap oracles ---------------------------------
ck q_window_day,q_budget_select,q_bool_or,q_collect,q_done_marker,q_tail1,q_top_per_group,q_groupby_max
ck q_distinct_agg,q_agg,q_range_cursor,q_sort_head,q_salted_agg,q_mixture,q_sample,q_split
ck q_vocab,q_quantiles,q_corpus_stats,q_corpus_filter,q_bm25,q_string_funs,q_scalar_funs,q_map_lookup
ck q_lang_id,q_tokens,q_quality,q_redact,q_quality_model,q_perplexity,q_fingerprint,q_cut
ck q_dedup_exact,q_dedup_bloom,q_dedup_incremental,q_dedup_simhash,q_pack,q_shuffle_order,q_repetition
ck q_ann_topk,q_ann_lsh,q_ann_ivf,q_ann_pq,q_centroid_assign,q_stream_minhash,q_contamination
ck q_multimodal_meta,q_multimodal_decode,q_multimodal_frames,q_multimodal_audio,q_chunk
ck q_offset_guard,q_txn_bundle,q_etl_denorm,q_asof_join,q_asof_join_skewed,q_range_join

# --- tier 2: mid-size outputs (20-40M rows), direct in fresh processes ----
ck q_semi_join
ck q_etl_stateless
ck q_multimodal_video
ck q_stream_window
ck q_embed_norm
ck q_mean_pool

# --- tier 3: special-cased ------------------------------------------------
echo "== minhash sf100 cross-check ($(date +%H:%M:%S))" | tee -a "$LOG"
timeout 7200 python3 tools/check_minhash_sf100.py /root/testdata/sf0.1 "$SF" "$OUT" >> "$LOG" 2>&1 \
  || echo "!! minhash rc=$?" | tee -a "$LOG"
chunked q_rolling_fingerprint doc_id 200

# --- tier 4: giant outputs (>=90M rows), chunked by row key ---------------
chunked q_scan_filter l_orderkey 20 lineitem
chunked q_inner_join o_orderkey 20 orders
chunked q_anti_join o_orderkey 20 orders
chunked q_yield l_orderkey 40 lineitem
chunked q_switch event_id 10 events
chunked q_variant event_id 10 events
chunked q_withfield user_id 10 events
chunked q_envelope event_id 10 events offset
chunked q_offset_assign event_id 10 events
chunked q_codec_avro event_id 10 events
chunked q_codec_connect event_id 10 events
chunked q_connect_json event_id 10 events
chunked q_session_window user_id 10 events
chunked q_fuse id 10 "documents:doc_id,events:event_id"

echo "ORACLE CAMPAIGN DONE ($(date +%H:%M:%S))" | tee -a "$LOG"
grep -c "^OK" "$LOG" | xargs echo "OK lines:"
grep -E "FAIL|!!" "$LOG" | head -40
