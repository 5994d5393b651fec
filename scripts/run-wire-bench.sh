#!/usr/bin/env bash
# Wire-level per-request latency benchmark on the real device (VERDICT #5).
#
# Phases (ONE TPU process at a time — see CLAUDE.md):
#   1. wire_bench.py prepare  — build index + server data dir, exit
#   2. server boot            — recovers the active epoch, warms all buckets
#   3. tools.load_test        — concurrent single-query requests over gRPC
#   4. wire_bench.py report   — merge into WIRE_r${ROUND}.json
#
# Usage: bash scripts/run-wire-bench.sh [N] [ROUND]
set -uo pipefail
cd "$(dirname "$0")/.."

N="${1:-1000000}"
ROUND="${2:-02}"
PORT="${PORT:-50351}"
MPORT="${MPORT:-18380}"
DATA="${DATA:-$(mktemp -d)}"
OUT="${OUT:-/tmp/wirebench}"
mkdir -p "${OUT}"
LOG="${OUT}/server.log"

cleanup() {
  if [[ -n "${SRV_PID:-}" ]]; then
    kill "${SRV_PID}" 2>/dev/null; wait "${SRV_PID}" 2>/dev/null
  fi
}
trap cleanup EXIT

echo "[wire] phase 1: prepare (data=${DATA})"
if [[ -f "${DATA}/epochs/epochs.json" ]]; then
  echo "[wire] reusing existing epoch snapshot in ${DATA}"
else
  python scripts/wire_bench.py prepare --data-path "${DATA}" --n "${N}" \
    || exit 1
fi

echo "[wire] phase 2: server boot"
# Throughput-mode config: deep worker pool (each StreamSearch holds one),
# device batches up to 512 (the pipelined coalescer overlaps batch N's
# compute with N-1's fetch, so throughput ≈ 1 batch per relay round trip).
cat > "${OUT}/server.yaml" <<EOF
grpc_workers: 64
max_batch_size: 512
stream_window: 16
max_concurrent_requests: 512
coalesce_window_ms: 1.0
EOF
python -m cuda_acceleratedvectordatabaseengine_tpu.server.main \
    --config "${OUT}/server.yaml" \
    --address "127.0.0.1:${PORT}" --data-path "${DATA}" \
    --metrics-port "${MPORT}" \
    > "${LOG}" 2>&1 &
SRV_PID=$!

# Readiness: wait for the warmed index to serve a real search (bucket warmup
# on recovery takes a few minutes of compiles on TPU).
echo "[wire] waiting for warmed readiness"
for i in $(seq 1 600); do
  if python - "$PORT" <<'EOF' 2>/dev/null
import sys, grpc, numpy as np
from cuda_acceleratedvectordatabaseengine_tpu.server.grpc_api import QueryServiceClient
from cuda_acceleratedvectordatabaseengine_tpu.server.proto import vdb_pb2
ch = grpc.insecure_channel(f"127.0.0.1:{sys.argv[1]}")
grpc.channel_ready_future(ch).result(timeout=2)
q = [vdb_pb2.Vector(values=np.zeros(768).astype(float))]
QueryServiceClient(ch).Search(vdb_pb2.SearchRequest(
    queries=q, topk=10, nprobe=32, index="default"), timeout=15)
EOF
  then READY=1; break; fi
  kill -0 "${SRV_PID}" 2>/dev/null || { echo "[wire] server died:"; tail -30 "${LOG}"; exit 1; }
  sleep 2
done
[[ -n "${READY:-}" ]] || { echo "[wire] never became ready"; tail -30 "${LOG}"; exit 1; }

echo "[wire] phase 3: load tests"
run_load() {  # name threads requests nprobe batch [--packed]
  python -m cuda_acceleratedvectordatabaseengine_tpu.tools.load_test \
    --target "127.0.0.1:${PORT}" --index default --dimension 768 \
    --threads "$2" --requests "$3" --topk 10 --nprobe "$4" --batch "$5" \
    ${6:-} > "${OUT}/$1.json" || return 1
  echo "[wire] $1:"; cat "${OUT}/$1.json"
}
run_load warm 8 50 32 1 || exit 1    # post-boot warm pass (not reported)
# b1 latency runs: the stage decomposition targets (decode/queue/dispatch/
# fetch/encode); sequential single client = the honest b1 p50
run_load b1_seq 1 200 32 1 --packed || exit 1
run_load t16_np32 16 200 32 1 || exit 1
run_load t16_np32_packed 16 200 32 1 --packed || exit 1
run_load t48_np32_packed 48 200 32 1 --packed || exit 1
# multi-query requests: the packed bytes field amortizes per-float proto
# cost, letting one RPC carry the batch the device wants
run_load b8_packed 16 200 32 8 --packed || exit 1
run_load b64_packed 8 100 32 64 --packed || exit 1
# bidirectional StreamSearch: one RPC per thread, requests pipelined
# through the coalescer (no per-request HTTP/2 stream setup)
run_load s16_packed_stream 16 200 32 1 "--packed --stream" || exit 1
run_load s8_b8_packed_stream 8 200 32 8 "--packed --stream" || exit 1
# throughput mode (the reference's 10K rps design point,
# query_service.h:172-173): deep stream windows feeding 512-query device
# batches through the pipelined coalescer
run_load s16_b16_packed_stream 16 400 32 16 "--packed --stream" || exit 1
run_load s16_b32_packed_stream 16 400 32 32 "--packed --stream" || exit 1
run_load s32_b32_packed_stream 32 300 32 32 "--packed --stream" || exit 1

echo "[wire] phase 3b: capture stage decomposition"
curl -s "http://127.0.0.1:${MPORT}/metrics" > "${OUT}/stages.txt" || true

echo "[wire] phase 4: report"
python scripts/wire_bench.py report \
  --run "${OUT}/b1_seq.json" \
  --run "${OUT}/t16_np32.json" --run "${OUT}/t16_np32_packed.json" \
  --run "${OUT}/t48_np32_packed.json" --run "${OUT}/b8_packed.json" \
  --run "${OUT}/b64_packed.json" \
  --run "${OUT}/s16_packed_stream.json" \
  --run "${OUT}/s8_b8_packed_stream.json" \
  --run "${OUT}/s16_b16_packed_stream.json" \
  --run "${OUT}/s16_b32_packed_stream.json" \
  --run "${OUT}/s32_b32_packed_stream.json" \
  --stages "${OUT}/stages.txt" \
  --output "WIRE_r${ROUND}.json" || exit 1
echo "[wire] done -> WIRE_r${ROUND}.json"
