"""Factory-wisdom sweep: measure the dispatch route for every size in
2^14..2^24 on the real device and ship the winners in
fftlab/plan/factory_wisdom.json (r3 review: the factory tier covered
only 2^20 and 2^24, so fresh devices ran heuristic routes that counted
A/Bs showed can be 3-5x off mid-range).

The r2c plans need no separate entries: plan_r2c_1d_split routes the
HALF-size complex transform through the same c2c table (plan/api.py
_half_route), so c2c coverage of 2^14..2^23 is r2c coverage of
2^15..2^24.

Protocol per size (all hardened, fftlab/bench/timing.py):
  - quick_bandwidth stamp BEFORE the size sweep; out-of-band => the
    size is deferred to the next pass instead of measured badly.
  - every route chained via dispatch.run_route (exactly what
    production executes), min_slope over 3 chain lengths,
    slope_valid guard with the 1-residency HBM floor at the band's
    top (400 GB/s) — impossible readings are discarded, not recorded.
  - winners merge into factory_wisdom.json by MIN-STATISTICS: an
    existing entry is replaced only by a strictly faster counted one
    (congestion only ever adds time).

Run: python scripts/tpu_wisdom_sweep.py  (env: SWEEP_WAIT_S budget,
SWEEP_SIZES="16384,32768" to restrict; artifact
bench_artifacts/wisdom_sweep.jsonl). Exits 0 if every size counted,
3 otherwise (retryable under scripts/probe_chain.sh).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

cache = os.path.expanduser("~/.cache/jax_comp")
os.makedirs(cache, exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

ART = "bench_artifacts/wisdom_sweep.jsonl"
TOTAL = 1 << 24  # samples per measurement: batch = TOTAL/n (>=1)


def log(**kw):
    kw["t"] = round(time.time(), 1)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def routes_for(n: int) -> list[str]:
    from fftlab.plan.split_tuning import _route_candidates

    # resident_cio and resident_vmem (v2) lost every counted A/B —
    # keep the sweep to plausible winners + the einsum control. The
    # _3x precision-reduced variants are EXCLUDED: they are a
    # different accuracy class (~104 dB vs 136) and must not compete
    # for the full-precision default route (a congested window crowned
    # resident_v4_3x at 2^19 with absolute timings 7x off — noise, and
    # even a true 3x win must stay behind FFTLAB_MXU_PRECISION=3x).
    return [r for r in _route_candidates(n)
            if r not in ("resident_cio", "resident_vmem")
            and not r.endswith("_3x")]


def warm_size(n: int) -> None:
    """Compile-only pass: run every route once (cold compiles land in
    the persistent cache) — congestion windows are FINE for this, so
    deferred sizes still make progress toward a fast counted pass."""
    from fftlab.core.types import FORWARD
    from fftlab.plan.dispatch import run_route

    batch = max(1, TOTAL // n)
    rng = np.random.default_rng(n & 0xFFFF)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    scale = 1.0 / float(np.sqrt(n))
    for route in routes_for(n):
        t0 = time.time()
        try:
            run_route(route, xr, xi, FORWARD,
                      scale=scale)[0].block_until_ready()
            log(name="warm", n=n, route=route,
                s=round(time.time() - t0, 1))
        except Exception as ex:  # noqa: BLE001
            log(name="warm_err", n=n, route=route, error=str(ex)[:160])


def measure_size(n: int, gbps_stamp: float) -> dict | None:
    """Chain-time every supported route at (TOTAL/n, n); return
    {route: ms} of VALID readings or None if nothing valid."""
    from fftlab.bench.timing import chain_time, min_slope, slope_valid
    from fftlab.core.types import FORWARD
    from fftlab.plan.dispatch import run_route
    from fftlab.plan.split_tuning import _route_candidates

    batch = max(1, TOTAL // n)
    rng = np.random.default_rng(n & 0xFFFF)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    scale = 1.0 / float(np.sqrt(n))
    # one HBM residency at the healthy band's TOP: anything faster is
    # a slope artifact regardless of congestion
    floor_ms = 16.0 * batch * n / (400.0 * 1e9) * 1e3
    ks = (8, 24, 48) if n <= (1 << 18) else (3, 8, 14)

    routes = routes_for(n)

    def time_routes(route_order) -> dict[str, float]:
        got: dict[str, float] = {}
        for route in route_order:
            def step(a, b, route=route):
                return run_route(route, a, b, FORWARD, scale=scale)

            try:
                raw = chain_time(step,
                                 lambda i: (xr + jnp.float32(1e-3 * i),
                                            xi - jnp.float32(1e-3 * i)),
                                 ks=ks, repeats=3, return_raw=True)
                ms = min_slope(raw) * 1e3
            except Exception as ex:  # noqa: BLE001
                log(name="route_err", n=n, route=route,
                    error=str(ex)[:160])
                continue
            if slope_valid(ms, floor_ms):
                got[route] = round(ms, 4)
            else:
                log(name="route_invalid", n=n, route=route,
                    ms=round(ms, 4), floor_ms=round(floor_ms, 4))
        return got

    # TWO passes in opposite order, winner must agree: sequential
    # measurement puts route i always at sweep start + i*delta, so
    # congestion moving mid-size crowns whichever route ran in the
    # calmer half (r4: einsum "beat" threestep 22 vs 53 ms at 2^22 —
    # backwards vs every clean-window prior). The reversed pass breaks
    # that alignment; per-route times keep the MIN of the two passes.
    p1 = time_routes(routes)
    p2 = time_routes(list(reversed(routes)))
    out = {r: min(p1.get(r, 1e30), p2.get(r, 1e30))
           for r in set(p1) | set(p2)}
    agree = (p1 and p2
             and min(p1, key=p1.get) == min(p2, key=p2.get))
    log(name="size_done", n=n, batch=batch, gbps=gbps_stamp,
        timings_ms=out, winner_agrees=bool(agree))
    return (out or None) if agree else None


def merge_factory(n: int, timings: dict[str, float]) -> None:
    """Min-statistics merge of this size's winner into the committed
    factory file (strictly-faster replaces; slower never does)."""
    path = os.path.join("fftlab", "plan", "factory_wisdom.json")
    try:
        with open(path) as f:
            factory = json.load(f)
    except (OSError, json.JSONDecodeError):
        factory = {}
    best = min(timings, key=timings.get)
    key = f"route:{n}:f32"
    old = factory.get(key)
    if old is not None and float(old.get("time_ms", 1e30)) <= timings[best]:
        log(name="factory_kept", n=n, old_ms=old["time_ms"],
            new_ms=timings[best])
        return
    factory[key] = {
        "algorithm": best,
        "batch": max(1, TOTAL // n),
        "platform": "tpu",
        "protocol": "slope",
        "source": "scripts/tpu_wisdom_sweep.py",
        "time_ms": timings[best],
        "timings_ms": timings,
    }
    with open(path, "w") as f:
        json.dump(factory, f, indent=2, sort_keys=True)
        f.write("\n")
    log(name="factory_updated", n=n, route=best, ms=timings[best])


def main() -> int:
    from fftlab.bench.timing import quick_bandwidth, stall_watchdog

    stall_watchdog(ART, stall_s=2400.0)
    assert jax.devices()[0].platform == "tpu"
    if os.environ.get("SWEEP_SIZES"):
        sizes = [int(s) for s in os.environ["SWEEP_SIZES"].split(",")]
    else:
        sizes = [1 << p for p in range(14, 25)]
    deadline = time.time() + float(os.environ.get("SWEEP_WAIT_S", "10800"))
    pending = list(sizes)
    warmed: set[int] = set()
    while pending and time.time() < deadline:
        still = []
        for n in pending:
            if time.time() > deadline:
                still.extend(pending[pending.index(n):])
                break
            try:
                g = round(quick_bandwidth(), 1)
            except Exception:
                g = -1.0
            if not (150.0 < g < 400.0):
                log(name="deferred", n=n, gbps=g)
                still.append(n)
                if n not in warmed:
                    # congestion is fine for COMPILES: bank them now so
                    # the counted pass later is pure measurement
                    warm_size(n)
                    warmed.add(n)
                else:
                    time.sleep(30)
                continue
            timings = measure_size(n, g)
            if timings:
                merge_factory(n, timings)
            else:
                still.append(n)
        pending = still
    log(name="sweep_done", uncounted=pending)
    return 0 if not pending else 3


if __name__ == "__main__":
    sys.exit(main())
