#!/usr/bin/env bash
# Round-5 TPU queue, part 2: the zipf capacity-headroom falsification pair.
# The 10M eps=0.15 run measured coverage UNCHANGED (0.6114 vs 0.6177
# baseline) — but its head cells sat at the capacity clamp (p99 = max =
# cap), so the replica pass spilled head copies into never-probed far
# cells. At 5M with capacity-factor 3.2 (same arena bytes) replicas land
# in their true 2nd-nearest cells: if coverage rises materially with eps,
# the 10M ceiling is an HBM-capacity constraint; if it stays flat, the
# geometry claim stands unconditionally. Runs AFTER r05_tpu_queue.sh.
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

run hostile_5m_eps0 4500 python bench.py --n 5000000 --skew zipf \
    --capacity-factor 3.2 --batch 4096 --force-chunked --mesh1 0
run hostile_5m_eps015 4500 python bench.py --n 5000000 --skew zipf \
    --multi-assign-eps 0.15 --multi-assign-budget 0.25 \
    --capacity-factor 3.2 --batch 4096 --mesh1 0

log "QUEUE2 DONE"
