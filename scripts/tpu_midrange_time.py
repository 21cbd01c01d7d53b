"""Time the mid-range (2^15..2^17) routes on the real TPU through
plan.split_tuning.tune_split_route — the SAME measure-and-persist loop
dispatch consumes (routes execute via dispatch.run_route with the chain
normalization folded into kernel tables, so no route pays a phantom
pass). Also times the two-pass kernel's row-major layout against its
blocked default (a kernel-internal knob, not a route).

Appends to bench_artifacts/midrange_time.jsonl and exports wisdom so
later processes dispatch the measured winners.
"""
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

ART = "bench_artifacts/midrange_time.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def main():
    assert jax.devices()[0].platform == "tpu"
    from fftlab.bench.timing import chain_time, min_slope
    from fftlab.kernels.fourstep_vmem import fft_split_large
    from fftlab.plan import wisdom
    from fftlab.plan.split_tuning import tune_split_route

    for e in (15, 16, 17):
        n = 1 << e
        B = (1 << 22) // n
        winner = tune_split_route(n, batch=B, ks=(8, 24, 48))
        rec = wisdom.lookup(n, "f32", kind="route") or {}
        log(name=f"route_2^{e}", winner=winner,
            timings_ms=rec.get("timings_ms"), batch=B)

        # Layout A/B inside the two-pass kernel (default blocked=True):
        rng = np.random.default_rng(e)
        xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
        sc = 1.0 / float(np.sqrt(n))
        mk = lambda i: (xr + jnp.float32(1e-3 * i),
                        xi - jnp.float32(1e-3 * i))
        for label, blocked in (("rowmajor", False), ("blocked", True)):
            step = lambda a, b, blk=blocked: fft_split_large(
                a, b, blocked=blk, scale=sc)
            try:
                raw = chain_time(step, mk, ks=(8, 24, 48), repeats=3,
                                 return_raw=True)
                dt = min_slope(raw)
                if dt > 0:
                    log(name=f"fs_{label}_2^{e}", ms=round(dt * 1e3, 3),
                        gsps=round(B * n / dt / 1e9, 3))
                else:
                    log(name=f"fs_{label}_2^{e}",
                        error="non-positive slope")
            except Exception as ex:  # noqa: BLE001
                log(name=f"fs_{label}_2^{e}", error=str(ex)[:160])

    path = wisdom.export_wisdom()
    log(name="done", wisdom_path=path)


if __name__ == "__main__":
    main()
