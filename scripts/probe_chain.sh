#!/bin/bash
# Resilient device-probe chain: wait for the service, run each probe,
# and on a stall-watchdog exit (code 3: the service died mid-probe and
# the blocked RPC was hard-exited) wait for the service again and retry.
# Artifacts append, so completed measurements are never lost.
set -u
cd "$(dirname "$0")/.."

run_with_retries() {
  local name="$1"; shift
  local tries="$1"; shift
  for ((i = 1; i <= tries; i++)); do
    WAITUP_S="${WAITUP_S:-14400}" python scripts/tpu_waitup.py || return 1
    "$@" >> "bench_artifacts/${name}.log" 2>&1
    local rc=$?
    echo "$(date -u +%H:%M:%S) ${name} attempt ${i} rc=${rc}" \
      >> bench_artifacts/probe_chain.log
    [[ $rc -ne 3 ]] && return $rc   # 3 = stall watchdog: retry
  done
  return 3
}

run_with_retries resident_ab 3 \
  env AB_WAIT_S="${AB_WAIT_S:-10800}" AB_ROUNDS="${AB_ROUNDS:-2}" \
  timeout 400m python scripts/tpu_resident_ab.py
run_with_retries threestep_probe 2 \
  env PROBE_WAIT_S=3600 PROBE_ROUNDS=2 \
  timeout 100m python scripts/tpu_threestep_probe.py
run_with_retries osfilter_probe 2 \
  env PROBE_WAIT_S=1800 \
  timeout 60m python scripts/tpu_osfilter_probe.py
echo "$(date -u +%H:%M:%S) chain done" >> bench_artifacts/probe_chain.log
