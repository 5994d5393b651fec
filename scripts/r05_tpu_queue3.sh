#!/usr/bin/env bash
# Round-5 TPU queue, part 3 (after part 2): validate the OPQ isometry fix
# at the 1M aniso point, then the headline bench with the mesh-1 section,
# then the kernel roofline (stretch). Strictly serial, one TPU process.
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

# 1. OPQ after the isometry fix: deep-rerank recall must now track plain
#    (containment already 1.0; the rerank ordering was the loss).
run pq_opq_fixed 2400 python scripts/dev_pq_sweep.py --aniso 0.5 \
    --config 512:32 --config 512:64 --config 512:128 \
    --config 512:128:k128 --opq

# 2. Headline bench with the mesh-1 SPMD section (BENCH_r05 preview).
run bench_full 3600 python bench.py

# 3. Kernel roofline at three operating points (KERNEL_r05).
run roofline 3600 python scripts/dev_sweep.py --roofline \
    --config pallas_grouped:8192:16:p4,t4 \
    --config pallas_grouped:8192:48:p16,t4 \
    --config pallas_grouped:8192:64:p32,t4

log "QUEUE3 DONE"
