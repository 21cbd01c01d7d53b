"""Time the mid-range (2^15..2^17) routes on the real TPU: two-pass
kernel (blocked/row-major) vs the XLA einsum path, total work held at
2^22 samples per measurement. Records route wisdom for the winners so
dispatch serves measured routes, and appends to
bench_artifacts/midrange_time.jsonl.
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
    from fftlab.algos.split_stockham import fft_split
    from fftlab.bench.timing import chain_time, min_slope
    from fftlab.kernels.fourstep_vmem import fft_split_large

    results = {}
    for e in (15, 16, 17):
        n = 1 << e
        B = (1 << 22) // n
        rng = np.random.default_rng(e)
        xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
        xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
        sc = 1.0 / float(np.sqrt(n))
        mk = lambda i: (xr + jnp.float32(1e-3 * i), xi - jnp.float32(1e-3 * i))

        def fs_step(a, b):
            return fft_split_large(a, b, scale=sc)

        def fs_blk_step(a, b):
            return fft_split_large(a, b, blocked=True, scale=sc)

        def ein_step(a, b):
            yr, yi = fft_split(a, b)
            s = jnp.float32(sc)
            return yr * s, yi * s

        per = {}
        for name, step in (("fourstep", fs_step),
                           ("fourstep_blocked", fs_blk_step),
                           ("einsum", ein_step)):
            try:
                raw = chain_time(step, mk, ks=(8, 24, 48), repeats=3,
                                 return_raw=True)
                dt = min_slope(raw)
                if dt <= 0:
                    log(name=f"{name}_2^{e}", error="non-positive slope")
                    continue
                gsps = B * n / dt / 1e9
                per[name] = dt
                log(name=f"{name}_2^{e}", ms=round(dt * 1e3, 3),
                    gsps=round(gsps, 3))
            except Exception as ex:  # noqa: BLE001
                log(name=f"{name}_2^{e}", error=str(ex)[:160])
        if per:
            results[n] = min(per, key=per.get)
            # Persist the measured winner as route wisdom.
            from fftlab.bench.timing import PROTOCOL
            from fftlab.plan import wisdom

            route = {"fourstep": "fourstep_vmem",
                     "fourstep_blocked": "fourstep_vmem",
                     "einsum": "einsum"}[results[n]]
            wisdom.record(n, "f32", route, per[results[n]] * 1e3,
                          kind="route",
                          extra={"protocol": PROTOCOL, "batch": B})
    if results:
        from fftlab.plan import wisdom

        path = wisdom.export_wisdom()
        log(name="winners", winners={str(k): v for k, v in results.items()},
            wisdom_path=path)


if __name__ == "__main__":
    main()
