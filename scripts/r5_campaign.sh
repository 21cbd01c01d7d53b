#!/bin/bash
# Round-5 device campaign, phase 1 (VERDICT.md item 1's clean-window
# sequence): wait for a HEALTHY window (quick_bandwidth in band twice),
# then wisdom sweep -> paired A/B re-verdicts -> full bench. Each phase
# retries behind service pings; artifacts land incrementally so an
# external kill loses nothing.
#
# Run: nohup bash scripts/r5_campaign.sh > bench_artifacts/r5_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts
stamp() { echo "=== $1 $(date +%H:%M:%S) ==="; }

phase() {
  local name="$1"; shift
  local tries="$1"; shift
  for ((i = 1; i <= tries; i++)); do
    stamp "${name} (attempt ${i})"
    if ! WAITUP_S="${WAITUP_S:-21600}" python scripts/tpu_waitup.py; then
      stamp "${name}: service dead through the waitup window"
      return 1
    fi
    "$@"
    local rc=$?
    stamp "${name} rc=${rc}"
    [[ $rc -ne 3 && $rc -ne 124 ]] && return $rc  # 3/124 retryable
  done
  return 3
}

# Healthy-window gate: two consecutive in-band readings (150-400 GB/s),
# bounded; on timeout proceed anyway — every downstream phase has its
# own per-measurement guards, and partial counted data beats none.
stamp health_gate
timeout 7500 python - <<'EOF'
import sys
sys.path.insert(0, ".")
from fftlab.bench.timing import wait_healthy
ok = wait_healthy(deadline_s=7200.0, sleep_s=90.0,
                  log=lambda d: print(d, flush=True))
print({"name": "health_gate", "healthy": ok}, flush=True)
EOF

phase wisdom_sweep 2 \
  env SWEEP_WAIT_S="${SWEEP_WAIT_S:-3600}" \
  timeout 3900 python scripts/tpu_wisdom_sweep.py

phase paired_ab 2 \
  env PAIRED_PASSES="${PAIRED_PASSES:-4}" PAIRED_WAIT_S="${PAIRED_WAIT_S:-3600}" \
  timeout 3900 python scripts/tpu_paired_ab.py

stamp bench
FFTLAB_BENCH_WAIT_S=600 FFTLAB_BENCH_BUDGET_S=900 timeout 2100 \
    python bench.py > bench_artifacts/bench_r5_campaign.out 2>bench_artifacts/bench_r5_campaign.err
echo "bench rc=$?"
tail -n 1 bench_artifacts/bench_r5_campaign.out > bench_artifacts/bench_r5s1.json || true

stamp done
