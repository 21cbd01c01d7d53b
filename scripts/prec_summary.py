"""Summarize device A/B artifacts (prec_ab / omnibus_ab) by
min-statistics over VALID readings.

On a service whose congestion swings 2-4x minute to minute, counted
same-window rounds are the gold standard but can be rare; the fallback
estimator is the per-candidate MINIMUM over all slope-valid readings
(positive, at or above the physical floor): congestion only ever adds
time, so each candidate's min converges to its uncongested cost as
rounds accumulate. Counted-round medians are reported beside the mins
when any counted round exists.

Usage: python scripts/prec_summary.py [bench_artifacts/prec_ab.jsonl ...]
"""

from __future__ import annotations

import json
import statistics
import sys

# physical floor for any *_ms reading in these artifacts: one HBM
# residency of the 16 x 2^20 split pair at the healthy band's top
FLOOR_MS = 16.0 * 16 * (1 << 20) / (400.0 * 1e9) * 1e3


def rows_of(path: str):
    try:
        with open(path) as f:
            for line in f:
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if r.get("name", "").endswith("_round"):
                    yield r
    except FileNotFoundError:
        pass


def main() -> None:
    paths = sys.argv[1:] or ["bench_artifacts/prec_ab.jsonl",
                             "bench_artifacts/omnibus_ab.jsonl"]
    for path in paths:
        per: dict[str, list[float]] = {}
        counted: dict[str, list[float]] = {}
        n_rounds = n_counted = 0
        for r in rows_of(path):
            n_rounds += 1
            if r.get("counted"):
                n_counted += 1
            for k, v in r.items():
                if not k.endswith("_ms") or not isinstance(v, (int, float)):
                    continue
                name = k[:-3].rstrip("_")
                if v >= FLOOR_MS:
                    per.setdefault(name, []).append(float(v))
                    if r.get("counted"):
                        counted.setdefault(name, []).append(float(v))
        if not per:
            continue
        print(f"\n{path}: {n_rounds} rounds ({n_counted} counted), "
              f"floor {FLOOR_MS:.2f} ms")
        print(f"  {'candidate':<24} {'min':>8} {'median':>8} {'#':>3}"
              f" {'counted-med':>12}")
        for name in sorted(per, key=lambda n: min(per[n])):
            v = per[name]
            cm = (f"{statistics.median(counted[name]):8.2f}"
                  if name in counted else "       —")
            print(f"  {name:<24} {min(v):8.2f} {statistics.median(v):8.2f}"
                  f" {len(v):3d} {cm:>12}")


if __name__ == "__main__":
    main()
