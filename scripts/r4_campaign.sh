#!/bin/bash
# Round-4 device campaign, phase 2 (afternoon): the morning phases
# banked 30+ min-statistics rounds (prec_ab/omnibus2); the afternoon
# runs the congestion-robust PAIRED ratio A/B for the actual design
# questions, then the full bench, then the factory sweep with whatever
# time remains. Phases retry behind service pings (a wedged probe
# exits 3 via its stall watchdog).
#
# Run: nohup bash scripts/r4_campaign.sh > bench_artifacts/r4_campaign.log 2>&1 &
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

phase paired_ab 2 \
  env PAIRED_PASSES="${PAIRED_PASSES:-4}" PAIRED_WAIT_S="${PAIRED_WAIT_S:-4200}" \
  timeout 4500 python scripts/tpu_paired_ab.py

stamp bench
FFTLAB_BENCH_WAIT_S=600 FFTLAB_BENCH_BUDGET_S=900 timeout 2100 \
    python bench.py > bench_artifacts/bench_r4_campaign.out 2>bench_artifacts/bench_r4_campaign.err
echo "bench rc=$?"
tail -n 1 bench_artifacts/bench_r4_campaign.out > bench_artifacts/bench_r4s1.json || true

phase wisdom_sweep 1 \
  env SWEEP_WAIT_S="${SWEEP_WAIT_S:-3600}" \
  timeout 3900 python scripts/tpu_wisdom_sweep.py

stamp done
