"""Device probe for the two-pass kernel's new mid-range (2^15..2^17):
compile + SNR-gate each size through the dispatch route on the real TPU,
then poll effective bandwidth until the service looks healthy (so the
session knows a clean bench window opened).

Appends JSON lines to bench_artifacts/midrange_probe.jsonl.
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

ART = "bench_artifacts/midrange_probe.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    from fftlab.kernels.fourstep_vmem import fft_split_large

    for e in (15, 16, 17):
        n = 1 << e
        rng = np.random.default_rng(e)
        x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
        xr = jnp.asarray(x.real, jnp.float32)[None]
        xi = jnp.asarray(x.imag, jnp.float32)[None]
        for blocked in (True, False):
            name = f"fs_2^{e}" + ("_blocked" if blocked else "")
            t0 = time.time()
            try:
                yr, yi = fft_split_large(xr, xi, blocked=blocked)
                got = (np.asarray(yr[0], np.float64)
                       + 1j * np.asarray(yi[0], np.float64))
                want = np.fft.fft(x)
                snr = 10 * np.log10(np.sum(np.abs(want) ** 2)
                                    / np.sum(np.abs(got - want) ** 2))
                log(name=name, ok=bool(snr > 100),
                    snr_db=round(float(snr), 1),
                    compile_s=round(time.time() - t0, 1))
            except Exception as ex:  # noqa: BLE001
                log(name=name, error=str(ex)[:200],
                    compile_s=round(time.time() - t0, 1))

    # Health loop: exit 0 the moment a clean window shows up.
    from fftlab.bench.timing import chain_time, min_slope

    shape = (16, 1 << 20)
    a = jnp.asarray(np.random.default_rng(0).standard_normal(shape),
                    jnp.float32)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(shape),
                    jnp.float32)
    mk = lambda i: (a + jnp.float32(i), b - jnp.float32(i))
    step = lambda p, q: (p * 1.0000001 + 1.0, q * 1.0000001 + 1.0)
    nbytes = 2 * 2 * 4 * shape[0] * shape[1]
    deadline = time.time() + float(os.environ.get("PROBE_WAIT_S", "7200"))
    while time.time() < deadline:
        try:
            raw = chain_time(step, mk, ks=(16, 56, 128), repeats=2,
                             return_raw=True)
            dt = min_slope(raw)
            gbps = nbytes / dt / 1e9 if dt > 0 else -1.0
        except Exception as ex:  # noqa: BLE001
            log(name="health_err", error=str(ex)[:120])
            gbps = -1.0
        log(name="health", gbps=round(gbps, 1))
        if 150.0 < gbps < 2000.0:
            log(name="healthy_window")
            return 0
        time.sleep(300)
    log(name="gave_up")
    return 1


if __name__ == "__main__":
    sys.exit(main())
