"""Summarize device A/B artifacts (prec_ab / omnibus_ab) by
min-statistics over VALID readings.

On a service whose congestion swings 2-4x minute to minute, counted
same-window rounds are the gold standard but can be rare; the fallback
estimator is the per-candidate MINIMUM over all slope-valid readings
(positive, at or above the physical floor): congestion only ever adds
time, so each candidate's min converges to its uncongested cost as
rounds accumulate. Counted-round medians are reported beside the mins
when any counted round exists.

Usage: python scripts/prec_summary.py [--apply] [artifacts...]

--apply: if a 1M FFT candidate has >=5 valid samples and its minimum
beats the committed factory entry for 2^20 strictly, record it as the
factory route (min-statistics rule: congestion only adds time, so a
better min in ANY window is a better route bound).
"""

from __future__ import annotations

import json
import statistics
import sys

# physical floor for any *_ms reading in these artifacts: one HBM
# residency of the 16 x 2^20 split pair at the healthy band's top
FLOOR_MS = 16.0 * 16 * (1 << 20) / (400.0 * 1e9) * 1e3
# per-class floors: fused filter = 24 B/sample; 16M = 3 passes
FLOOR_FILTER = 24.0 * 16 * (1 << 20) / (400.0 * 1e9) * 1e3
FLOOR_16M = 3.0 * 16.0 * (1 << 24) / (400.0 * 1e9) * 1e3


def floor_of(name: str) -> float:
    if "filt" in name:
        return FLOOR_FILTER
    if name.startswith(("ts_", "hi_ts", "lo_ts")) or "16m" in name:
        return FLOOR_16M
    return FLOOR_MS


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


# candidate name (prec/omnibus artifacts) -> dispatch route at 2^20
ROUTE_OF = {
    "v4_hi": "resident_v4", "v4_3x": "resident_v4_3x",
    "v6_hi": "resident_v6", "v6_3x": "resident_v6_3x",
    "hi_res_v4": "resident_v4", "hi_res_v6": "resident_v6",
    "lo_res_v4": "resident_v4_3x", "lo_res_v6": "resident_v6_3x",
    "res_v4": "resident_v4", "res_v6": "resident_v6",
    "res_v4_3x": "resident_v4_3x", "res_v6_3x": "resident_v6_3x",
    "res": "resident_vmem", "fs_blocked": "fourstep_vmem",
    "hi_fs_blocked": "fourstep_vmem",
}


def apply_factory(per: dict[str, list[float]], min_samples: int = 5) -> None:
    import os

    path = os.path.join("fftlab", "plan", "factory_wisdom.json")
    try:
        with open(path) as f:
            factory = json.load(f)
    except (OSError, json.JSONDecodeError):
        factory = {}
    key = "route:1048576:f32"
    best_name, best_ms = None, float(
        factory.get(key, {}).get("time_ms", 1e30))
    for name, vals in per.items():
        route = ROUTE_OF.get(name)
        if route is None or len(vals) < min_samples:
            continue
        if min(vals) < best_ms:
            best_name, best_ms = name, min(vals)
    if best_name is None:
        print("--apply: no candidate beats the factory entry "
              f"({factory.get(key, {}).get('time_ms')} ms) with "
              f">={min_samples} valid samples")
        return
    factory[key] = {
        "algorithm": ROUTE_OF[best_name],
        "batch": 16, "platform": "tpu", "protocol": "slope",
        "source": "scripts/prec_summary.py --apply (min-statistics)",
        "time_ms": round(best_ms, 4), "samples": len(per[best_name]),
    }
    with open(path, "w") as f:
        json.dump(factory, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"--apply: factory 2^20 route -> {ROUTE_OF[best_name]} "
          f"({best_ms:.2f} ms over {len(per[best_name])} samples)")


def main() -> None:
    apply = "--apply" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--apply"]
    paths = args or ["bench_artifacts/prec_ab.jsonl",
                     "bench_artifacts/omnibus_ab.jsonl"]
    merged: dict[str, list[float]] = {}
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
                if v >= floor_of(name):
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
            merged.setdefault(name, []).extend(v)
    if apply:
        apply_factory(merged)


if __name__ == "__main__":
    main()
