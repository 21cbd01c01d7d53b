#!/bin/bash
# Resilient device-probe chain: wait for the service, run each probe,
# and on a retryable exit (code 3: stall watchdog hard-exited a wedged
# probe, or the probe gave up waiting for a healthy window) wait for
# the service again and retry. Artifacts append, so completed
# measurements are never lost. If the service stays dead through a
# whole waitup window, the chain aborts — re-waiting per probe on a
# dead service would just burn hours.
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts

chainlog() { echo "$(date -u +%H:%M:%S) $*" >> bench_artifacts/probe_chain.log; }

run_with_retries() {
  local name="$1"; shift
  local tries="$1"; shift
  for ((i = 1; i <= tries; i++)); do
    if ! WAITUP_S="${WAITUP_S:-14400}" python scripts/tpu_waitup.py; then
      chainlog "${name} attempt ${i}: service dead through the whole waitup window — aborting chain"
      exit 1
    fi
    "$@" >> "bench_artifacts/${name}.log" 2>&1
    local rc=$?
    chainlog "${name} attempt ${i} rc=${rc}"
    [[ $rc -ne 3 ]] && return $rc   # 3 = retryable (stall / unhealthy)
  done
  return 3
}

run_with_retries resident_ab 3 \
  env AB_WAIT_S="${AB_WAIT_S:-10800}" AB_ROUNDS="${AB_ROUNDS:-2}" \
  timeout 400m python scripts/tpu_resident_ab.py
run_with_retries threestep_probe 2 \
  env PROBE_WAIT_S=3000 PROBE_ROUNDS=2 \
  timeout 150m python scripts/tpu_threestep_probe.py
run_with_retries osfilter_probe 2 \
  env PROBE_WAIT_S=1800 \
  timeout 60m python scripts/tpu_osfilter_probe.py
chainlog "chain done"
