#!/bin/bash
# Round-5 device campaign, phase 3 (the morning finale — historically
# the calmest window): wisdom-sweep retry to fill remaining factory
# sizes, the FULL paired A/B (second-campaign evidence for any phase-2
# verdict), and the final fresh bench artifact.
#
# Run: nohup bash scripts/r5_campaign3.sh <phase2_pid> \
#        > bench_artifacts/r5_campaign3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts
stamp() { echo "=== $1 $(date +%H:%M:%S) ==="; }

if [[ $# -ge 1 && -n "${1:-}" ]]; then
  stamp "waiting for phase-2 pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 120; done
  stamp "phase 2 finished"
fi

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

# Healthy-window gate (bounded; phases have their own guards on timeout)
stamp health_gate
timeout 5500 python - <<'EOF'
import sys
sys.path.insert(0, ".")
from fftlab.bench.timing import wait_healthy
ok = wait_healthy(deadline_s=5400.0, sleep_s=90.0,
                  log=lambda d: print(d, flush=True))
print({"name": "health_gate", "healthy": ok}, flush=True)
EOF

phase wisdom_sweep3 2 \
  env SWEEP_WAIT_S="${SWEEP_WAIT_S:-2700}" \
  timeout 3000 python scripts/tpu_wisdom_sweep.py

phase paired_ab3 2 \
  env PAIRED_PASSES="${PAIRED_PASSES:-3}" PAIRED_WAIT_S="${PAIRED_WAIT_S:-3000}" \
  timeout 3300 python scripts/tpu_paired_ab.py

stamp bench
FFTLAB_BENCH_WAIT_S=600 FFTLAB_BENCH_BUDGET_S=1100 timeout 2400 \
    python bench.py > bench_artifacts/bench_r5c3.out 2>bench_artifacts/bench_r5c3.err
echo "bench rc=$?"
tail -n 1 bench_artifacts/bench_r5c3.out > bench_artifacts/bench_r5s3.json || true

stamp done
