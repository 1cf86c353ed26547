#!/usr/bin/env bash
# Round-13 sf100 re-verification for the gates whose code or oracle
# changed this round (bounded-heap ANN rewrites, centroid argmax,
# stripHtml comment/CDATA blocks, ETL fast path + plan-build work,
# footer-sized bloom). Family chunks in FRESH JVMs (run_sf100.sh
# discipline), fresh-process DuckDB checks afterward.
#
# q_clean_pipeline is dumped here but verified by the two-pass
# check_span_sf100.sh campaign (its one-shot oracle OOMs at sf100).
#
# usage: check_sf100_r13.sh [sfDir] [outDir]
set -uo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/repo/testdata-sf100}
OUT=${2:-/tmp/verify_sf100_r13}
export SPARK_DRIVER_MEM=${SPARK_DRIVER_MEM:-48g}
export SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32}
export GRAFT_VERIFY_PARTS=${GRAFT_VERIFY_PARTS:-32}

chunks=(
  "q_dedup_bloom,q_centroid_assign,q_html_strip"
  "q_ann_lsh,q_ann_ivf,q_ann_pq"
  "q_ann_sq,q_ann_ivfpq"
  "q_etl_stateless,q_etl_denorm"
  "q_clean_pipeline"
)
for c in "${chunks[@]}"; do
  first=${c%%,*}
  if [ -d "$OUT/$first" ]; then
    echo "== chunk $c cached"; continue
  fi
  echo "== chunk $c ($(date +%H:%M:%S))"
  tools/run_main.sh graft.Verify "$SF" "$OUT" none "--only=$c" \
    || { echo "!! chunk $c failed"; exit 1; }
done
echo "DUMPS DONE ($(date +%H:%M:%S))"
