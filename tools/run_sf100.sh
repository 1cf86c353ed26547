#!/usr/bin/env bash
# sf100 Verify campaign: dump gates in FAMILY CHUNKS, each in a fresh JVM
# via run_main.sh, so one chunk's shuffle spill (blockmgr) is reclaimed at
# process exit instead of accumulating 80+ gates of spill on one disk —
# the single-process run left 30 GB of spill and 24 GB free before its
# first heavy gate finished.
#
# Skipped at the Verify level (documented in BENCHNOTES):
#  - q_ngram_jaccard: exact trigram jaccard over within-block pairs,
#    quadratic by definition — bounded-corpus by contract (<= sf1).
#  - q_dedup_embed / q_dedup_cluster / q_dedup_keep: exact within-label
#    all-pairs cosine. The fixture keeps 10 labels at every sf, so blocks
#    grow linearly and pairs quadratically: 4.0G pair-cosines at sf10
#    (verified) -> 401G at sf100, ~100x sf10's wall. The 100 TB path for
#    near-dup at this scale is minhash/LSH/ANN — all verified at sf100.
#
# usage: run_sf100.sh [sfDir] [outDir]   (env: SPARK_DRIVER_MEM, CPUS)
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-64g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
# parallel dump files: pandas/DuckDB checkers read directories, so the
# driver's one-file contract doesn't apply to campaign dumps
export GRAFT_VERIFY_PARTS=${GRAFT_VERIFY_PARTS:-32}

chunks=(
  "q_chunk,q_multimodal_frames,q_switch,q_map_lookup,q_dedup_exact,q_rolling_fingerprint,q_cut,q_multimodal_meta"
  "q_window_day,q_budget_select,q_fingerprint,q_bool_or,q_collect,q_done_marker,q_fuse,q_yield,q_withfield"
  "q_agg,q_range_cursor,q_tail1,q_top_per_group,q_groupby_max,q_distinct_agg,q_variant,q_mixture"
  "q_sort_head,q_scan_filter"
  "q_inner_join,q_anti_join,q_semi_join,q_asof_join,q_asof_join_skewed,q_range_join,q_salted_agg"
  "q_lang_id,q_tokens,q_quality,q_redact,q_vocab,q_quantiles,q_repetition,q_quality_model,q_perplexity"
  "q_bm25,q_corpus_filter,q_corpus_stats,q_contamination,q_string_funs,q_scalar_funs"
  "q_dedup_minhash"
  "q_dedup_simhash,q_dedup_bloom,q_dedup_incremental,q_pack,q_sample,q_split,q_shuffle_order"
  "q_ann_topk,q_ann_batch,q_ann_lsh,q_ann_ivf,q_ann_pq,q_centroid_assign,q_embed_norm,q_mean_pool"
  "q_stream_minhash,q_stream_window,q_session_window,q_txn_bundle,q_etl_stateless,q_etl_denorm,q_envelope,q_offset_guard,q_offset_assign"
  "q_codec_avro,q_codec_connect,q_connect_json,q_multimodal_decode,q_multimodal_audio,q_multimodal_video"
  "q_multimodal_resize,q_ann_ivfpq,q_ann_sq"
  "q_line_dedup,q_html_strip,q_url_domain,q_unicode_norm,q_span_dedup,q_clean_pipeline"
)

i=0
for c in "${chunks[@]}"; do
  i=$((i+1))
  # resume PER GATE: run only the gates of this chunk with no dump yet,
  # so an interrupted chunk re-runs its missing tail, not the whole list
  IFS=',' read -ra gs <<< "$c"
  todo=""
  for g in "${gs[@]}"; do
    [ -d "$OUT/$g" ] || todo="${todo:+$todo,}$g"
  done
  if [ -z "$todo" ]; then echo "== chunk $i already dumped, skipping"; continue; fi
  echo "== chunk $i/${#chunks[@]}: $todo  ($(date +%H:%M:%S), $(df -h / | awk 'NR==2{print $4}') free)"
  tools/run_main.sh graft.Verify "$SF" "$OUT" q_ngram_jaccard "--only=$todo" \
    > "/tmp/sf100_chunk_$i.log" 2>&1
  echo "   chunk $i exit=$? ($(date +%H:%M:%S))"
done
echo "campaign done: $(ls "$OUT" | wc -l) entries in $OUT"
