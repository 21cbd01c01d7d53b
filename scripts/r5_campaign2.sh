#!/bin/bash
# Round-5 device campaign, phase 2: the NEW kernels' turn. Runs after
# phase 1 (pass its PID as $1 to wait for it): compile-gate the r5
# kernels (fused r2c/c2r, filter v7) to warm the cache, then the
# paired A/B with the new questions (v7 vs lanes/v5, v4_r256, v4_ds,
# v6 vs v4), then a fresh bench whose rfft/bluestein/filter rows sweep
# the new candidates.
#
# Run: nohup bash scripts/r5_campaign2.sh <phase1_pid> \
#        > bench_artifacts/r5_campaign2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts
stamp() { echo "=== $1 $(date +%H:%M:%S) ==="; }

if [[ $# -ge 1 && -n "${1:-}" ]]; then
  stamp "waiting for phase-1 pid $1"
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
  stamp "phase 1 finished"
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

phase compile_gate 2 \
  env GATE_ONLY="rfft_resident,irfft_resident,resident_filter_v7,resident_vmem_v4,resident_vmem_v6,resident_filter_v5,fourstep_filter_lanes,fourstep_filter_blocked,threestep_vmem,threestep_vmem_lanes,threestep_vmem_blocked" \
  timeout 1800 python scripts/tpu_compile_gate.py

phase paired_ab2 2 \
  env PAIRED_PASSES="${PAIRED_PASSES:-4}" PAIRED_WAIT_S="${PAIRED_WAIT_S:-4200}" \
  PAIRED_ONLY="resfilt_v7:fsfilt_lanes,resfilt_v7:resfilt_v5,v4_r256:v4_hi,v4_ds:v4_hi,v6_hi:v4_hi,ts_lanes:ts_r128,ts_blocked:ts_r128" \
  timeout 4500 python scripts/tpu_paired_ab.py

stamp bench
FFTLAB_BENCH_WAIT_S=900 FFTLAB_BENCH_BUDGET_S=1100 timeout 2700 \
    python bench.py > bench_artifacts/bench_r5c2.out 2>bench_artifacts/bench_r5c2.err
echo "bench rc=$?"
tail -n 1 bench_artifacts/bench_r5c2.out > bench_artifacts/bench_r5s2.json || true

stamp done
