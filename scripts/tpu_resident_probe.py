"""Device probe for the one-residency kernel (kernels/resident_vmem.py):
compile + SNR-gate 2^15/2^17/2^20 on the real TPU, then time the
16x1M headline A/B against the two-pass route with the hardened chain
protocol, including the FFTLAB_RES_R staging-width variants.

Appends JSON lines to bench_artifacts/resident_probe.jsonl.
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

ART = "bench_artifacts/resident_probe.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def snr_gate():
    from fftlab.kernels.resident_vmem import fft_split_resident

    for e in (15, 17, 20):
        n = 1 << e
        rng = np.random.default_rng(e)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        xr = jnp.asarray(x.real, jnp.float32)[None]
        xi = jnp.asarray(x.imag, jnp.float32)[None]
        t0 = time.time()
        try:
            yr, yi = fft_split_resident(xr, xi)
            got = (np.asarray(yr[0], np.float64)
                   + 1j * np.asarray(yi[0], np.float64))
            want = np.fft.fft(x)
            snr = 10 * np.log10(np.sum(np.abs(want) ** 2)
                                / np.sum(np.abs(got - want) ** 2))
            log(name=f"res_2^{e}", ok=bool(snr > 100),
                snr_db=round(float(snr), 1),
                compile_s=round(time.time() - t0, 1))
            if snr <= 100:
                return False
        except Exception as ex:  # noqa: BLE001
            log(name=f"res_2^{e}", error=str(ex)[:300],
                compile_s=round(time.time() - t0, 1))
            return False
    return True


def time_route(route, xr, xi, n, B):
    from fftlab.bench.timing import chain_time, min_slope
    from fftlab.core.types import FORWARD
    from fftlab.plan.dispatch import run_route

    scale = 1.0 / float(np.sqrt(n))

    def step(a, b):
        return run_route(route, a, b, FORWARD, scale=scale)

    raw = chain_time(step, lambda i: (xr + jnp.float32(1e-3 * i),
                                      xi - jnp.float32(1e-3 * i)),
                     ks=(4, 10, 16), repeats=3, return_raw=True)
    dt = min_slope(raw)
    return dt


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    if not snr_gate():
        log(name="gate_failed")
        return 1

    B, n = 16, 1 << 20
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)

    # R variants: compile-gate each before timing
    variants = []
    for r in ("128", "256", "512"):
        os.environ["FFTLAB_RES_R"] = r
        try:
            from fftlab.kernels.resident_vmem import fft_split_resident

            t0 = time.time()
            yr, yi = fft_split_resident(xr[:1], xi[:1])
            yr.block_until_ready()
            log(name=f"compile_R{r}", ok=True,
                compile_s=round(time.time() - t0, 1))
            variants.append(r)
        except Exception as ex:  # noqa: BLE001
            log(name=f"compile_R{r}", error=str(ex)[:300])
    os.environ.pop("FFTLAB_RES_R", None)

    for rnd in range(int(os.environ.get("PROBE_ROUNDS", "3"))):
        for r in variants:
            os.environ["FFTLAB_RES_R"] = r
            try:
                dt = time_route("resident_vmem", xr, xi, n, B)
                gsps = B * n / dt / 1e9 if dt > 0 else -1.0
                log(name=f"time_res_R{r}", round=rnd,
                    ms=round(dt * 1e3, 4), gsps=round(gsps, 2))
            except Exception as ex:  # noqa: BLE001
                log(name=f"time_res_R{r}", round=rnd, error=str(ex)[:200])
        os.environ.pop("FFTLAB_RES_R", None)
        try:
            dt = time_route("fourstep_vmem", xr, xi, n, B)
            gsps = B * n / dt / 1e9 if dt > 0 else -1.0
            log(name="time_fourstep", round=rnd,
                ms=round(dt * 1e3, 4), gsps=round(gsps, 2))
        except Exception as ex:  # noqa: BLE001
            log(name="time_fourstep", round=rnd, error=str(ex)[:200])
    log(name="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
