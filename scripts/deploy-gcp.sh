#!/usr/bin/env bash
# Deploy to a GKE cluster with TPU v5e node pools (counterpart of the
# reference's scripts/deploy-gcp.sh GPU flow).
set -euo pipefail
PROJECT="${PROJECT:?set PROJECT}"
CLUSTER="${CLUSTER:-vdb-tpu}"
ZONE="${ZONE:-us-west4-a}"
IMAGE="gcr.io/${PROJECT}/vdb-tpu:latest"

echo "[deploy] building image ${IMAGE}"
docker build -t "${IMAGE}" .
docker push "${IMAGE}"

echo "[deploy] ensuring TPU node pool"
gcloud container node-pools describe tpu-v5e --cluster "${CLUSTER}" \
    --zone "${ZONE}" --project "${PROJECT}" >/dev/null 2>&1 || \
gcloud container node-pools create tpu-v5e \
    --cluster "${CLUSTER}" --zone "${ZONE}" --project "${PROJECT}" \
    --machine-type ct5lp-hightpu-8t --num-nodes 2

echo "[deploy] applying manifests"
kubectl apply -f k8s/namespace.yaml
kubectl apply -f k8s/rbac.yaml
kubectl apply -f k8s/configmap.yaml
kubectl apply -f k8s/persistent-volume.yaml
kubectl set image -f k8s/deployment.yaml vdb-server="${IMAGE}" --local -o yaml | kubectl apply -f -
kubectl apply -f k8s/service.yaml
kubectl apply -f k8s/hpa.yaml
kubectl apply -f k8s/servicemonitor.yaml || true   # needs prometheus-operator
kubectl -n vdb rollout status deployment/vdb-server --timeout=600s
echo "[deploy] done"
