#!/bin/bash
# Post-outage TPU measurement sequence: interleaved kernel A/Bs first
# (phase-robust), then probes, then the standard bench capture.
# Run with  bash scripts/tpu_recapture.sh 2>&1 | tee /tmp/recapture.log
set -u
cd "$(dirname "$0")/.."

echo "=== merge A/B (insert fast path vs insertloop vs rebuild) ==="
timeout 1200 python scripts/merge_ab.py 5 || echo "merge_ab FAILED rc=$?"

echo "=== tile sweep under the fast path ==="
timeout 1200 python scripts/tile_sweep.py || echo "tile_sweep FAILED rc=$?"

echo "=== kernel floor chain ==="
timeout 1200 python scripts/kernel_floor.py || echo "kernel_floor FAILED rc=$?"

echo "=== sub-tile gate A/B (gate_cols 1/2/4/8 — VERDICT r2 #4) ==="
timeout 1800 python scripts/gate_ab.py || echo "gate_ab FAILED rc=$?"

echo "=== SW variant A/B (fast vs r2, 3 length regimes — VERDICT r2 #7) ==="
timeout 1800 python scripts/sw_ab.py || echo "sw_ab FAILED rc=$?"

echo "=== bucketed + hybrid at 2^20 (uniform) ==="
timeout 1800 python scripts/bucketed_probe.py 20 17 || echo "bucketed_probe FAILED rc=$?"

echo "=== bucketed + hybrid at 2^20 (zipf — the pinned-reroute stress case) ==="
timeout 1800 python scripts/bucketed_probe.py 20 17 zipf || echo "bucketed_probe zipf FAILED rc=$?"

echo "=== bucketed + hybrid at 2^20 (english skew + all-pairs — the realistic regime, DESIGN.md 4.4) ==="
timeout 1800 python scripts/bucketed_probe.py 20 17 english all || echo "bucketed_probe english FAILED rc=$?"

echo "=== e2e 10k works steady-state with stage attribution ==="
timeout 1800 python scripts/e2e_probe.py 10000 4 || echo "e2e_probe FAILED rc=$?"

echo "=== standard bench (captures bench_details.json incl. #5c) ==="
timeout 3600 python bench.py || echo "bench FAILED rc=$?"

# Snapshot the capture so no later degraded run can erase it (round-2
# verdict Weak #6: bench_details.json is gitignored and overwritten by
# every run).  ROUND should be set by the caller; default r03.
ROUND="${ROUND:-r03}"
if python -c "import json,sys; d=json.load(open('bench_details.json')); sys.exit(1 if d.get('degraded') else 0)"; then
  cp bench_details.json "bench_details_${ROUND}.json"
  echo "snapshotted healthy capture -> bench_details_${ROUND}.json (commit it)"
else
  echo "capture is DEGRADED (cpu fallback) — not snapshotting"
fi

echo "=== driver entry + multichip dryrun ==="
timeout 1800 python __graft_entry__.py || echo "graft_entry FAILED rc=$?"
