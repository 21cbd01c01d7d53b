#!/bin/bash
# End-of-round finalization: merge every bench artifact (r3 + r4),
# regenerate README/docs tables from the merge, and print the A/B
# summaries for the session log. Safe to re-run.
set -u
cd "$(dirname "$0")/.."

arts=(bench_artifacts/bench_r3s1.json bench_artifacts/bench_r3s2.json
      bench_artifacts/bench_r3s3.json)
for f in bench_artifacts/bench_r4*.json; do
  [[ -s "$f" ]] && arts+=("$f")
done
echo "merging: ${arts[*]}"
python scripts/merge_bench_artifacts.py \
  bench_artifacts/bench_r4_merged.json "${arts[@]}"
python scripts/update_perf_docs.py bench_artifacts/bench_r4_merged.json

echo; echo "=== A/B summaries ==="
python scripts/prec_summary.py bench_artifacts/prec_ab.jsonl \
  bench_artifacts/omnibus2.jsonl bench_artifacts/omnibus_ab.jsonl
