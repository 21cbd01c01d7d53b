#!/bin/bash
# Round-4 device campaign, serialized (ONE device user at a time; the
# host must stay idle while anything here is counting — see
# .claude/skills/verify: host CPU load poisons device timing).
#
# Phase order = value order for a rare clean window:
#   1. MXU-precision A/B (the 1M roofline lever, interleaved sampling)
#   2. omnibus A/B (lane variants, filter sandwich, 16M burst width)
#   3. factory wisdom sweep 2^14..2^24 (counted sizes merge
#      incrementally; merged sizes only improve by min-statistics)
#   4. full bench.py -> driver-shaped artifact + route wisdom
#
# Every phase runs under waitup + retry (probe_chain.sh discipline):
# a wedged probe exits 3 via its stall watchdog and the phase retries
# after the service answers pings again, instead of burning its whole
# timeout against a dead window.
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

phase omnibus 2 \
  env OMNI_ROUNDS="${OMNI_ROUNDS:-2}" OMNI_WAIT_S="${OMNI_WAIT_S:-5400}" \
  timeout 5700 python scripts/tpu_omnibus2.py

phase prec_probe 1 \
  env PREC_ROUNDS="${PREC_ROUNDS:-2}" PREC_WAIT_S="${PREC_WAIT_S:-3600}" \
  timeout 3900 python scripts/tpu_prec_probe.py

phase wisdom_sweep 1 \
  env SWEEP_WAIT_S="${SWEEP_WAIT_S:-5400}" \
  timeout 5700 python scripts/tpu_wisdom_sweep.py

stamp bench
FFTLAB_BENCH_WAIT_S=600 FFTLAB_BENCH_BUDGET_S=900 timeout 2100 \
    python bench.py > bench_artifacts/bench_r4_campaign.out 2>bench_artifacts/bench_r4_campaign.err
echo "bench rc=$?"
tail -n 1 bench_artifacts/bench_r4_campaign.out > bench_artifacts/bench_r4s1.json || true

stamp done
