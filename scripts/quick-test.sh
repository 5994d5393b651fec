#!/usr/bin/env bash
# Fast local validation: unit tests on the virtual 8-device CPU mesh +
# a quick end-to-end bench smoke.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/ -x -q
python bench.py --quick
