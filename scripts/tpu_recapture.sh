#!/bin/bash
# Post-outage TPU measurement sequence: interleaved kernel A/Bs first
# (phase-robust), then the standard bench capture.  Logs to stdout;
# run with  bash scripts/tpu_recapture.sh | tee /tmp/recapture.log
set -u
cd "$(dirname "$0")/.."

echo "=== merge A/B (insert fast path vs insertloop vs rebuild) ==="
timeout 1200 python scripts/merge_ab.py 5 || echo "merge_ab FAILED rc=$?"

echo "=== tile sweep under the fast path ==="
timeout 1200 python scripts/tile_sweep.py || echo "tile_sweep FAILED rc=$?"

echo "=== kernel floor chain ==="
timeout 1200 python scripts/kernel_floor.py || echo "kernel_floor FAILED rc=$?"

echo "=== standard bench (captures bench_details.json) ==="
timeout 3600 python bench.py || echo "bench FAILED rc=$?"
