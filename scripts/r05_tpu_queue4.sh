#!/usr/bin/env bash
# Round-5 TPU queue, part 4: the kernel roofline rerun with the fixed
# argument-passing steps (the first attempt closure-captured the 10 GB
# arena as HLO constants and hung in client-side lowering).
set -u
cd "$(dirname "$0")/.."
DRV=logs_r05/queue_driver.log
log() { echo "$(date +%H:%M:%S) $*" >> "$DRV"; }

until grep -q "QUEUE3 DONE" "$DRV" 2>/dev/null; do sleep 30; done

run() {
  local name=$1 to=$2; shift 2
  log "START $name"
  timeout "$to" "$@" > "logs_r05/$name.log" 2>&1
  log "END $name rc=$?"
  sleep 150
}

run roofline_v2 3600 python scripts/dev_sweep.py --roofline \
    --config pallas_grouped:8192:16:p4,t4 \
    --config pallas_grouped:8192:48:p16,t4 \
    --config pallas_grouped:8192:64:p32,t4

log "QUEUE4 DONE"
