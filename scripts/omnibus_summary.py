"""Digest the omnibus A/B artifact: per-candidate minima and medians
across ALL rounds plus counted-round values.

On this service the min over many rounds is the faithful estimator
(congestion only adds time), with one caveat the reader must apply:
sub-floor minima from SHORT chains (ks=(2,5,8) on the 16M candidates)
can be deflated-slope artifacts, while sub-copy-chain-floor times on
slab-DMA kernels can be REAL (BlockSpec DMA outruns the XLA
elementwise copy chain that defines the "floor" bandwidth) — see
docs/performance.md.

Usage: python scripts/omnibus_summary.py [path]
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 \
        else "bench_artifacts/omnibus_ab.jsonl"
    rounds = []
    with open(path) as f:
        for line in f:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if r.get("name") == "omni_round":
                rounds.append(r)
    if not rounds:
        print(f"no omni_round rows in {path}")
        return 1
    counted = [r for r in rounds if r.get("counted")]
    keys = sorted({k for r in rounds for k in r if k.endswith("_ms")})
    print(f"{len(rounds)} rounds ({len(counted)} counted):")
    for k in keys:
        ts = [r[k] for r in rounds
              if isinstance(r.get(k), (int, float)) and r[k] > 0]
        if not ts:
            continue
        cts = [r[k] for r in counted
               if isinstance(r.get(k), (int, float)) and r[k] > 0]
        cs = ("  counted: " + ", ".join(f"{t:.2f}" for t in cts)
              if cts else "")
        print(f"  {k[:-3]:22s} n={len(ts):2d} min={min(ts):8.2f} "
              f"med={statistics.median(ts):8.2f}{cs}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
