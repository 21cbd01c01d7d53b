"""Summarize the resident A/B artifact and optionally apply the result.

Reads bench_artifacts/resident_ab.jsonl (counted rounds only), prints
per-candidate median/min times across rounds, and with --apply records
the winning plain-FFT candidate as dispatch route wisdom for n=2^20
(plan.dispatch consults wisdom before its static heuristic, so this IS
the default flip — roadmap round-3 item 2) and prints the
FFTLAB_RESIDENT_FILTER setting the filter winner implies.

Usage: python scripts/ab_summary.py [--apply] [path]
"""

from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, ".")

ROUTE_OF = {
    "res": "resident_vmem",
    "res_v4": "resident_v4",
    "res_v6": "resident_v6",
    "res_r256": "resident_vmem",   # same route, wider out_rows
    "res_cio": "resident_cio",
    "fs_blocked": "fourstep_vmem",
}
FILTER_ENV = {"resfilt": "1", "resfilt_cio": "cio", "resfilt_v5": "v5",
              "fsfilt_blocked": "0"}


def load_rounds(path: str) -> list[dict]:
    rounds = []
    try:
        with open(path) as f:
            for line in f:
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if row.get("name") == "ab_round" and row.get("counted"):
                    rounds.append(row)
    except FileNotFoundError:
        pass
    return rounds


def summarize(rounds: list[dict]) -> dict[str, dict]:
    out: dict[str, dict] = {}
    names = sorted({k[:-3] for r in rounds for k in r
                    if k.endswith("_ms") and k != "health_ms"})
    for name in names:
        ts = [r[name + "_ms"] for r in rounds
              if isinstance(r.get(name + "_ms"), (int, float))
              and r[name + "_ms"] > 0]
        if ts:
            out[name] = {"median_ms": round(statistics.median(ts), 4),
                         "min_ms": round(min(ts), 4), "rounds": len(ts)}
    return out


def main() -> int:
    apply = "--apply" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    path = args[0] if args else "bench_artifacts/resident_ab.jsonl"
    rounds = load_rounds(path)
    if not rounds:
        print(f"no counted rounds in {path}")
        return 1
    summary = summarize(rounds)
    print(f"{len(rounds)} counted round(s):")
    for name, s in sorted(summary.items(), key=lambda kv: kv[1]["min_ms"]):
        print(f"  {name:16s} median {s['median_ms']:8.3f} ms   "
              f"min {s['min_ms']:8.3f} ms   ({s['rounds']} rounds)")

    ffts = {k: v for k, v in summary.items() if k in ROUTE_OF}
    filts = {k: v for k, v in summary.items() if k in FILTER_ENV}
    if ffts:
        best = min(ffts, key=lambda k: ffts[k]["median_ms"])
        print(f"\nplain-FFT winner: {best} -> route {ROUTE_OF[best]}")
        if apply:
            from fftlab.bench.timing import PROTOCOL
            from fftlab.plan import wisdom

            wisdom.import_wisdom()
            wisdom.record(1 << 20, "f32", ROUTE_OF[best],
                          ffts[best]["median_ms"], kind="route",
                          extra={"protocol": PROTOCOL, "batch": 16,
                                 "platform": "tpu",
                                 "source": "ab_summary",
                                 "variant": best})
            print(f"recorded route wisdom: {ROUTE_OF[best]} @ "
                  f"{ffts[best]['median_ms']} ms ->",
                  wisdom.export_wisdom())
            # Also commit the winner to the repo-shipped factory tier so
            # the flip survives a wiped ~/.cache (fresh sessions/checkouts
            # auto-load it at first dispatch lookup).
            import json as _json

            factory = {}
            try:
                with open(wisdom.FACTORY_PATH) as f:
                    factory = _json.load(f)
            except (FileNotFoundError, ValueError):
                pass
            factory.update({k: v for k, v in wisdom.snapshot().items()
                            if k.startswith("route:")})
            with open(wisdom.FACTORY_PATH, "w") as f:
                _json.dump(factory, f, indent=2, sort_keys=True)
            print(f"factory wisdom updated: {wisdom.FACTORY_PATH} "
                  "(commit it)")
    if filts:
        bestf = min(filts, key=lambda k: filts[k]["median_ms"])
        print(f"filter winner: {bestf} -> set "
              f"FFTLAB_RESIDENT_FILTER={FILTER_ENV[bestf]} (or make it "
              f"the dispatch default if a resident variant won)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
