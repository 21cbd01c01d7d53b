#!/bin/bash
# Round-3 follow-up chain: runs after scripts/probe_chain.sh releases
# the device (one TPU process at a time — see verify SKILL).
#
#   1. compile gate  — prove every registered route compiles (r3 #8)
#   2. resident diag — decompose the resident kernel's slowness
#   3. bench.py      — fresh driver-grade artifact (patient budgets)
#   4. update docs   — regenerate README/perf tables from the artifact
#
# Usage: scripts/r3_followup.sh <chain_pid>
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts

flog() { echo "$(date -u +%H:%M:%S) $*" >> bench_artifacts/r3_followup.log; }

CHAIN_PID="${1:-}"
if [[ -n "$CHAIN_PID" ]]; then
  flog "waiting for probe chain pid $CHAIN_PID"
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
  flog "probe chain exited"
fi

if ! WAITUP_S=7200 python scripts/tpu_waitup.py; then
  flog "service dead through waitup window — aborting"
  exit 1
fi

flog "compile gate"
timeout 90m python scripts/tpu_compile_gate.py \
  >> bench_artifacts/compile_gate.log 2>&1
flog "compile gate rc=$?"

flog "resident diag"
DIAG_ROUNDS=2 timeout 60m python scripts/tpu_resident_diag.py \
  >> bench_artifacts/resident_diag.log 2>&1
flog "resident diag rc=$?"

flog "bench"
FFTLAB_BENCH_WAIT_S=1200 FFTLAB_BENCH_BUDGET_S=1800 \
  timeout 70m python bench.py > bench_artifacts/bench_r3s1.json \
  2> bench_artifacts/bench_r3s1.err
rc=$?
flog "bench rc=$rc"

if [[ -s bench_artifacts/bench_r3s1.json ]]; then
  python scripts/update_perf_docs.py bench_artifacts/bench_r3s1.json \
    >> bench_artifacts/r3_followup.log 2>&1
  flog "docs regenerated"
fi
flog "followup done"
