#!/usr/bin/env bash
# Round-5 TPU queue, part 2 (CONSOLIDATED — replaces the earlier part 2/3
# waiters). Runs after part 1's "QUEUE DONE". Priority order under the
# remaining wall clock:
#   1. stream20m_v2 — the STREAM_r03 comparison point (hot-clusters 32,
#      cache-frac 0.25: working set FITS the cache; part 1's run used the
#      defaults whose 3358-list union overflows 1024 slots = miss-regime)
#      + the new hotness-restage phases. Store loads from .stores (~2 min).
#   2. pq_opq_fixed — validate the OPQ isometry fix at the 1M point.
#   3. hostile_5m pair — zipf capacity-headroom isolation (eps0 baseline,
#      then eps015 with 3.2x per-list headroom at the same arena bytes).
#   4. bench_full — headline + mesh-1 SPMD section (BENCH_r05 preview).
#   5. roofline — KERNEL_r05 (stretch).
set -u
cd "$(dirname "$0")/.."
DRV=logs_r05/queue_driver.log
log() { echo "$(date +%H:%M:%S) $*" >> "$DRV"; }

until grep -q "QUEUE DONE" "$DRV" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  timeout "$to" "$@" > "logs_r05/$name.log" 2>&1
  log "END $name rc=$?"
  sleep 150
}

run stream20m_v2 5400 python scripts/dev_streaming_bench.py \
    --store-dir .stores/streamstore_i8 --hot-clusters 32 --cache-frac 0.25

run pq_opq_fixed 2400 python scripts/dev_pq_sweep.py --aniso 0.5 \
    --config 512:32 --config 512:64 --config 512:128 \
    --config 512:128:k128 --opq

run hostile_5m_eps0 4500 python bench.py --n 5000000 --skew zipf \
    --capacity-factor 3.2 --batch 4096 --force-chunked --mesh1 0
run hostile_5m_eps015 4500 python bench.py --n 5000000 --skew zipf \
    --multi-assign-eps 0.15 --multi-assign-budget 0.25 \
    --capacity-factor 3.2 --batch 4096 --mesh1 0

run bench_full 3600 python bench.py

run roofline 3600 python scripts/dev_sweep.py --roofline \
    --config pallas_grouped:8192:16:p4,t4 \
    --config pallas_grouped:8192:48:p16,t4 \
    --config pallas_grouped:8192:64:p32,t4

log "QUEUE2 DONE"
