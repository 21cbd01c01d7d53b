#!/bin/bash
# Round-4 device campaign, serialized (ONE device user at a time; the
# host must stay idle while anything here is counting — see
# .claude/skills/verify: host CPU load poisons device timing).
#
# Phase order = value order for a rare clean window:
#   1. wait for the service (fresh-subprocess pings)
#   2. MXU-precision A/B (the 1M roofline lever: 6 vs 3 bf16 passes,
#      with v4/v6/fs_blocked counted per arm)
#   3. omnibus A/B (lane variants, filter sandwich, 16M burst width)
#   4. factory wisdom sweep 2^14..2^24 (resumes: counted sizes merge
#      incrementally; already-merged sizes only improve by min-stats)
#   5. full bench.py -> driver-shaped artifact + route wisdom
#
# Run: nohup bash scripts/r4_campaign.sh > bench_artifacts/r4_campaign.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p bench_artifacts
stamp() { echo "=== $1 $(date +%H:%M:%S) ==="; }

stamp waitup
WAITUP_S=${WAITUP_S:-36000} python scripts/tpu_waitup.py || exit 1

stamp prec_probe
PREC_ROUNDS=${PREC_ROUNDS:-2} PREC_WAIT_S=${PREC_WAIT_S:-7200} \
    timeout 7500 python scripts/tpu_prec_probe.py
echo "prec_probe rc=$?"

stamp omnibus
OMNI_ROUNDS=${OMNI_ROUNDS:-2} OMNI_WAIT_S=${OMNI_WAIT_S:-7200} \
    timeout 7500 python scripts/tpu_omnibus_ab.py
echo "omnibus rc=$?"

stamp wisdom_sweep
SWEEP_WAIT_S=${SWEEP_WAIT_S:-7200} timeout 7500 \
    python scripts/tpu_wisdom_sweep.py
echo "wisdom_sweep rc=$?"

stamp bench
FFTLAB_BENCH_WAIT_S=600 FFTLAB_BENCH_BUDGET_S=900 timeout 2100 \
    python bench.py > bench_artifacts/bench_r4_campaign.out 2>bench_artifacts/bench_r4_campaign.err
echo "bench rc=$?"
tail -n 1 bench_artifacts/bench_r4_campaign.out > bench_artifacts/bench_r4s1.json || true

stamp done
