#!/usr/bin/env bash
# Round-close verification sweep (VERDICT round-4 #2): re-run every
# benchmark surface in one session and leave a timestamped log per leg,
# so PERFORMANCE.md's "Round-N close" table can be filled from the
# artifacts. Run on the TPU host with nothing else holding the tunnel
# (CLAUDE.md: one TPU client at a time).
#
# Usage: bash tools/round_close_sweep.sh /tmp/round_close
set -uo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
OUT="${1:-/tmp/round_close}"
mkdir -p "$OUT"
cd "$REPO"

run_leg() {  # name, command...
  local name="$1"; shift
  echo "=== $name: $* ($(date -u +%H:%M:%S))" | tee -a "$OUT/sweep.log"
  if "$@" >"$OUT/$name.log" 2>&1; then
    echo "=== $name OK ($(date -u +%H:%M:%S))" | tee -a "$OUT/sweep.log"
  else
    echo "=== $name FAILED (exit $?) — see $OUT/$name.log" \
      | tee -a "$OUT/sweep.log"
  fi
}

run_leg headline    python bench.py
run_leg serve       python bench.py serve
run_leg population  python bench.py population
run_leg roofline    python bench.py roofline
run_leg big         python bench.py big
run_leg golden_tpu  python -m tests.test_golden check-tpu
run_leg demo        bash tools/demo.sh "$OUT/demo"
run_leg full_chain  bash tools/demo_full_chain.sh "$OUT/chain"
run_leg dryrun env -u PALLAS_AXON_POOL_IPS \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
echo "sweep complete — logs in $OUT" | tee -a "$OUT/sweep.log"
