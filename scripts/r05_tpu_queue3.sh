#!/usr/bin/env bash
# Round-5 TPU queue, part 3: re-validate after the afternoon's fixes.
#   1. bench_full_v2 — mesh-1 section with device-resident queries (the
#      first section measured the relay H2D tax, not the SPMD path).
#   2. pq_opq_hp — OPQ deep rerank with the HIGHEST-precision rerank
#      einsum (the remaining candidate for the 0.982 plateau).
#   3. pq_plain_hp — plain under the same einsum fix (does plain's 0.998
#      move too?).
set -u
cd "$(dirname "$0")/.."
DRV=logs_r05/queue_driver.log
log() { echo "$(date +%H:%M:%S) $*" >> "$DRV"; }

until grep -q "QUEUE2 DONE" "$DRV" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  timeout "$to" "$@" > "logs_r05/$name.log" 2>&1
  log "END $name rc=$?"
  sleep 150
}

run bench_full_v2 3600 python bench.py

run pq_opq_hp 2400 python scripts/dev_pq_sweep.py --aniso 0.5 \
    --config 512:32 --config 512:64 --config 512:128 \
    --config 512:128:k128 --opq
run pq_plain_hp 2400 python scripts/dev_pq_sweep.py --aniso 0.5 \
    --config 512:64 --config 512:128

log "QUEUE3 DONE"
