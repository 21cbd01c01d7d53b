"""Device probe for the one-residency kernels (kernels/resident_vmem.py,
v2: BlockSpec-delivered, no manual DMA): compile + SNR-gate on the real
TPU, then INTERLEAVED A/B timing against the two-pass kernels — same
window, alternating candidates, several rounds — so congestion hits all
candidates equally.

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
    from fftlab.kernels.resident_vmem import (
        fft_split_resident,
        spectral_filter_resident,
    )

    ok = True
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
            ok = ok and snr > 100
        except Exception as ex:  # noqa: BLE001
            log(name=f"res_2^{e}", error=str(ex)[:300],
                compile_s=round(time.time() - t0, 1))
            ok = False
    # filter gate at the headline size
    n = 1 << 20
    rng = np.random.default_rng(99)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    H = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    t0 = time.time()
    try:
        yr, yi = spectral_filter_resident(
            jnp.asarray(x.real, jnp.float32)[None],
            jnp.asarray(x.imag, jnp.float32)[None],
            jnp.asarray(H.real, jnp.float32),
            jnp.asarray(H.imag, jnp.float32))
        got = (np.asarray(yr[0], np.float64)
               + 1j * np.asarray(yi[0], np.float64))
        want = np.fft.ifft(np.fft.fft(x) * H)
        snr = 10 * np.log10(np.sum(np.abs(want) ** 2)
                            / np.sum(np.abs(got - want) ** 2))
        log(name="resfilt_2^20", ok=bool(snr > 100),
            snr_db=round(float(snr), 1),
            compile_s=round(time.time() - t0, 1))
    except Exception as ex:  # noqa: BLE001
        log(name="resfilt_2^20", error=str(ex)[:300],
            compile_s=round(time.time() - t0, 1))
    return ok


def main():
    assert jax.devices()[0].platform == "tpu", "probe needs the TPU"
    from fftlab.bench.timing import chain_time, min_slope
    from fftlab.core.types import FORWARD
    from fftlab.kernels.fourstep_vmem import (
        fft_split_large,
        spectral_filter_large,
    )
    from fftlab.kernels.resident_vmem import (
        fft_split_resident,
        spectral_filter_resident,
    )

    gate_ok = snr_gate()
    if not gate_ok:
        log(name="gate_failed")

    B, n = 16, 1 << 20
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    scale = 1.0 / float(np.sqrt(n))
    # E[|H|^2] = 1 keeps chained magnitudes stationary (Parseval)
    H = rng.standard_normal(n).astype(np.float32)
    hr = jnp.asarray(H)
    hi = jnp.zeros(n, jnp.float32)

    fft_cands = [
        ("res", lambda a, b: fft_split_resident(a, b, FORWARD, scale=scale)),
        ("fs_blocked", lambda a, b: fft_split_large(
            a, b, FORWARD, blocked=True, scale=scale)),
    ]
    filt_cands = [
        ("resfilt", lambda a, b: spectral_filter_resident(a, b, hr, hi)),
        ("fsfilt_blocked", lambda a, b: spectral_filter_large(
            a, b, hr, hi, blocked=True)),
    ]

    rounds = int(os.environ.get("PROBE_ROUNDS", "3"))
    for rnd in range(rounds):
        for name, fn in fft_cands + filt_cands:
            try:
                raw = chain_time(fn,
                                 lambda i: (xr + jnp.float32(1e-3 * i),
                                            xi - jnp.float32(1e-3 * i)),
                                 ks=(3, 8, 14), repeats=3, return_raw=True)
                dt = min_slope(raw)
                gsps = B * n / dt / 1e9 if dt > 0 else -1.0
                log(name=f"time_{name}", round=rnd,
                    ms=round(dt * 1e3, 4), gsps=round(gsps, 2))
            except Exception as ex:  # noqa: BLE001
                log(name=f"time_{name}", round=rnd, error=str(ex)[:200])
    log(name="done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
