#!/usr/bin/env bash
# Round-5 TPU measurement queue. ONE TPU process at a time (CLAUDE.md);
# strictly serial, pauses between runs so the relay can free the previous
# process's HBM lazily. Logs to logs_r05/. Each step tolerates failure and
# continues (artifacts are assembled afterwards from whatever succeeded).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs_r05 .stores

DRV=logs_r05/queue_driver.log
log() { echo "$(date +%H:%M:%S) $*" >> "$DRV"; }

# Wait for any currently-running TPU process (the zipf run) to finish.
if [[ -f /tmp/tpu_run.pid ]]; then
  PID=$(cat /tmp/tpu_run.pid)
  log "waiting for existing TPU pid $PID"
  while kill -0 "$PID" 2>/dev/null; do sleep 20; done
  log "pid $PID done"
fi

run() {  # name timeout_s cmd...
  local name=$1 to=$2; shift 2
  log "START $name"
  timeout "$to" "$@" > "logs_r05/$name.log" 2>&1
  log "END $name rc=$?"
  sleep 150   # relay lazy HBM free between heavy runs
}

# 1. mesh-1 Mosaic-under-shard_map early smoke (cheap; bench.py re-measures
#    at the 10M point later — this catches a compile regression early).
run mesh1_smoke 2400 python scripts/dev_mesh1_tpu.py \
    --n 500000 --batch 1024 --n-batches 10

# 2+3. PQ mechanism diagnostic: plain vs OPQ, shortlist containment at
#      every depth (PQ_r05, VERDICT #2).
PQCFG="--aniso 0.5 --config 512:0 --config 512:32 --config 512:64 \
 --config 512:128 --config 512:64:k64 --config 512:128:k128 \
 --config 512:512:k512"
run pq_plain 2400 python scripts/dev_pq_sweep.py $PQCFG
run pq_opq 2400 python scripts/dev_pq_sweep.py $PQCFG --opq

# 4. 20M streaming store: build + persist (future rounds reuse), warm/cold
#    serving, hotness-restage phases (STREAM_r05, VERDICT #6).
run stream20m 5400 python scripts/dev_streaming_bench.py \
    --store-dir .stores/streamstore_i8

# 5. PQ capacity tier measured end-to-end on the persisted store
#    (PQCAP_r05, VERDICT #3): fresh pipeline rows, margin point included.
run pqcap20m 5400 python scripts/dev_pq_capacity.py \
    --store-dir .stores/streamstore_i8 --preload \
    --rerank 0,256,512,512@0.3

# 6. Wire ladder with interleaved packed/unpacked + stall timelines
#    (WIRE_r05, VERDICT #4).
run wire 5400 bash scripts/run-wire-bench.sh 1000000 05

log "QUEUE DONE"
