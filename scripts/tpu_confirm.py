"""Interleaved A/B confirmation for the 1M-kernel layout decision.

The main sweep (tpu_session.py) measures each variant once, minutes
apart — but service health drifts on that timescale, so single readings
can't settle a close race (fs_blocked 3.10 ms vs fs_base 3.40 ms).
This script interleaves the candidates round-robin, several rounds, so
every candidate samples the same health windows; the per-candidate
MIN over rounds is the decision statistic (congestion only adds time).

Run AFTER the main sweep: timeout 3600 python scripts/tpu_confirm.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
from fftlab.bench.timing import chain_time, min_slope  # noqa: E402

OUT = sys.argv[1] if len(sys.argv) > 1 else "bench_artifacts/confirm.jsonl"
ROUNDS = int(os.environ.get("FFTLAB_CONFIRM_ROUNDS", "4"))


def log(rec: dict):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    B = 16
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    ctr = [0]

    def mk(i):
        ctr[0] += 1
        t = jnp.float32(1e-3 * ctr[0])
        return (xr + t, xi - t)

    s = 1.0 / float(np.sqrt(n))  # chain normalization, kernel-folded
    sj = jnp.float32(s)

    import fftlab.kernels.fourstep_vmem as fv
    from fftlab.algos.split_stockham import fft_split

    def ein(a, b):
        yr, yi = fft_split(a, b)
        return yr * sj, yi * sj  # XLA fuses this; kernels fold instead

    cands = {
        "fs_blocked": lambda a, b: fv.fft_split_large(a, b, blocked=True,
                                                      scale=s),
        "fs_base": lambda a, b: fv.fft_split_large(a, b, blocked=False,
                                                   scale=s),
        "fs_blocked_w256": lambda a, b: fv.fft_split_large(
            a, b, blocked=True, width=256, scale=s),
        "einsum": ein,
    }

    # Pool RAW chain times across rounds per candidate, then take the
    # slope of the pooled per-k minimums. (Taking min over per-round
    # slopes is NOT conservative — a round whose short chain was
    # congested in every repeat yields a spuriously tiny slope, and the
    # min keeps it; pooled per-k mins can only converge downward to the
    # true chain cost.)
    pooled: dict[str, dict[int, list[float]]] = {}
    for r in range(ROUNDS):
        for name, step in cands.items():
            try:
                raw = chain_time(step, mk, ks=(16, 96), repeats=3,
                                 return_raw=True)
            except Exception as e:
                log({"name": name, "round": r, "error": str(e)[:160]})
                continue
            acc = pooled.setdefault(name, {})
            for k, ts in raw.items():
                acc.setdefault(k, []).extend(ts)
            dt = min_slope(raw)
            rec = {"name": name, "round": r,
                   "ms": round(dt * 1e3, 3) if dt > 0 else None,
                   "gsps": round(B * n / dt / 1e9, 3) if dt > 0 else None}
            log(rec)
    best = {name: min_slope(acc) for name, acc in pooled.items()
            if len(acc) == 2}
    best = {k: v for k, v in best.items() if v > 0}
    if best:
        summary = {k: {"ms": round(v * 1e3, 3),
                       "gsps": round(B * n / v / 1e9, 3)}
                   for k, v in sorted(best.items(), key=lambda kv: kv[1])}
        log({"name": "confirm_summary", "best": summary,
             "winner": min(best, key=best.get)})


if __name__ == "__main__":
    main()
