#!/usr/bin/env bash
# TPU-VM development environment setup — the counterpart of the
# reference's `scripts/setup-deps.sh` + `setup-v100-dev.sh` (CUDA/driver/
# Arrow toolchain for V100 hosts). A TPU VM needs far less: libtpu ships
# with the VM image, JAX talks to it directly, and the only native build
# is the small C++ host runtime (native/vdbhost.cc).
#
# Usage (on a fresh Cloud TPU VM, e.g. v5litepod-8):
#   bash scripts/setup-tpu-dev.sh [--venv PATH]
set -euo pipefail

VENV="${HOME}/vdb-venv"
while [[ $# -gt 0 ]]; do
  case "$1" in
    --venv) VENV="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 1 ;;
  esac
done

info()  { echo -e "\033[0;34m[INFO]\033[0m $*"; }
ok()    { echo -e "\033[0;32m[OK]\033[0m $*"; }
fail()  { echo -e "\033[0;31m[FAIL]\033[0m $*"; exit 1; }

# ---- system packages (build tools for the native host runtime) --------
info "installing system packages"
sudo apt-get update -qq
sudo apt-get install -y -qq build-essential make python3-venv python3-dev \
    git curl > /dev/null

# ---- python env -------------------------------------------------------
info "creating venv at ${VENV}"
python3 -m venv "${VENV}"
# shellcheck disable=SC1091
source "${VENV}/bin/activate"
pip install -q --upgrade pip

# jax[tpu] pulls the matching libtpu; the rest mirrors the runtime deps
# the server imports (see pyproject.toml).
info "installing python dependencies (jax[tpu] + serving deps)"
pip install -q "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
pip install -q grpcio protobuf pyyaml numpy ml_dtypes pyarrow pytest

# ---- native host runtime ---------------------------------------------
info "building the native host runtime (staging gather + fused rerank)"
make -C "$(dirname "$0")/../cuda_acceleratedvectordatabaseengine_tpu/native"

# ---- validation -------------------------------------------------------
info "validating the TPU is visible"
python - <<'EOF'
import jax
devs = jax.devices()
assert devs and devs[0].platform == "tpu", f"no TPU visible: {devs}"
print(f"[OK] {len(devs)} TPU device(s): {devs[0].device_kind}")
EOF

info "running the smoke drive (100K x 128 IVF-Flat round trip)"
cd "$(dirname "$0")/.."
python - <<'EOF'
import numpy as np
import cuda_acceleratedvectordatabaseengine_tpu as vdb
rng = np.random.default_rng(0)
x = rng.standard_normal((100_000, 128)).astype(np.float32)
idx = vdb.IVFFlatIndex(vdb.IVFFlatConfig(dimension=128, nlist=256))
idx.train(x); idx.add(x)
d, ids = idx.search(x[:8], vdb.SearchParams(nprobe=32, k=10))
assert (ids[:, 0] == np.arange(8).astype(ids.dtype)).all()
print("[OK] end-to-end search round trip")
EOF

ok "TPU dev environment ready. Activate with: source ${VENV}/bin/activate"
ok "Run the suite:   python -m pytest tests/ -q"
ok "Start a server:  python -m cuda_acceleratedvectordatabaseengine_tpu.server.main --config configs/production.yaml"
