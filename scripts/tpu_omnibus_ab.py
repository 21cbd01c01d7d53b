"""Omnibus same-window A/B: every open r3 performance question in ONE
interleaved round, so each rare clean window answers all of them with
same-window comparisons (cross-window numbers on this service swing
2-4x and cannot be compared).

Per round (all warm-cached from today's runs):
  1M FFT        res (resident v2) vs fs_blocked (two-pass blocked)
  1M filter     resfilt (v2) vs resfilt_cio (v3) vs fsfilt_blocked
  16M FFT       ts_r128 vs ts_r256 (threestep burst-width question)
  diag          read_only / phase_a / write_only / phase_b_not /
                phase_b (resident phase isolation)

Control: fs_blocked in its 2.0-8.0 ms plausibility window (the same
control the counted resident A/B used). Appends to
bench_artifacts/omnibus_ab.jsonl; exits 0 when >=1 round counted,
3 otherwise (retryable).
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

ART = "bench_artifacts/omnibus_ab.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def main() -> int:
    from fftlab.bench.timing import chain_time, min_slope, stall_watchdog

    stall_watchdog(ART, stall_s=3000.0)
    assert jax.devices()[0].platform == "tpu"
    from fftlab.core.types import FORWARD
    from fftlab.kernels.fourstep_vmem import (
        fft_split_large,
        spectral_filter_large,
    )
    from fftlab.kernels.resident_vmem import (
        fft_split_resident,
        spectral_filter_resident,
        spectral_filter_resident_cio,
        spectral_filter_resident_v5,
    )
    from fftlab.kernels.threestep_vmem import fft_split_huge

    B, n = 16, 1 << 20
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    scale = 1.0 / float(np.sqrt(n))
    H = rng.standard_normal(n).astype(np.float32)
    hr, hi = jnp.asarray(H), jnp.zeros(n, jnp.float32)

    nh = 1 << 24
    hxr = jnp.asarray(rng.standard_normal((1, nh)), jnp.float32)
    hxi = jnp.asarray(rng.standard_normal((1, nh)), jnp.float32)
    hscale = 1.0 / float(np.sqrt(nh))

    def ts(r3):
        def f(a, b):
            os.environ["FFTLAB_TS_W1"] = "128"
            os.environ["FFTLAB_TS_R3"] = str(r3)
            return fft_split_huge(a, b, FORWARD, blocked=True,
                                  scale=hscale)
        return f

    # (name, fn, inputs, ks)
    small = ((3, 8, 14), (xr, xi))
    huge = ((2, 5, 8), (hxr, hxi))
    cands = [
        ("fs_blocked", lambda a, b: fft_split_large(
            a, b, FORWARD, blocked=True, scale=scale), small),
        ("res", lambda a, b: fft_split_resident(
            a, b, FORWARD, scale=scale), small),
        ("res_v4", lambda a, b: fft_split_resident(
            a, b, FORWARD, scale=scale, layout="v4"), small),
        ("res_v6", lambda a, b: fft_split_resident(
            a, b, FORWARD, scale=scale, layout="v6"), small),
        ("res_v6_3x", lambda a, b: fft_split_resident(
            a, b, FORWARD, scale=scale, layout="v6", prec="3x"), small),
        ("res_v4_3x", lambda a, b: fft_split_resident(
            a, b, FORWARD, scale=scale, layout="v4", prec="3x"), small),
        ("resfilt", lambda a, b: spectral_filter_resident(
            a, b, hr, hi), small),
        ("resfilt_v5", lambda a, b: spectral_filter_resident_v5(
            a, b, hr, hi), small),
        ("resfilt_v5_3x", lambda a, b: spectral_filter_resident_v5(
            a, b, hr, hi, prec="3x"), small),
        ("resfilt_cio", lambda a, b: spectral_filter_resident_cio(
            a, b, hr, hi), small),
        ("fsfilt_blocked", lambda a, b: spectral_filter_large(
            a, b, hr, hi, blocked=True, lanes=False), small),
        ("fs_lanes", lambda a, b: fft_split_large(
            a, b, FORWARD, blocked=True, scale=scale, lanes=True), small),
        ("fsfilt_lanes", lambda a, b: spectral_filter_large(
            a, b, hr, hi, blocked=True, lanes=True), small),
        ("ts_r128", ts(128), huge),
        ("ts_lanes", lambda a, b: fft_split_huge(
            a, b, FORWARD, lanes=True, scale=hscale), huge),
    ]

    # Diag variants join the same rounds (phase attribution needs the
    # same window as the full kernel's time).
    sys.path.insert(0, os.path.dirname(__file__))
    from tpu_resident_diag import VARIANTS, _mk_variant

    diag_fns = {}
    for v in VARIANTS:
        try:
            fn = _mk_variant(v, B, n, interpret=False)
            fn(xr, xi)[0].block_until_ready()
            diag_fns[v] = fn
        except Exception as ex:  # noqa: BLE001
            log(name=f"diag_warm_{v}", error=str(ex)[:200])

    for name, fn, (ks, (a0, b0)) in cands:
        t0 = time.time()
        fn(a0, b0)[0].block_until_ready()
        log(name=f"warm_{name}", s=round(time.time() - t0, 1))

    deadline = time.time() + float(os.environ.get("OMNI_WAIT_S", "14400"))
    want = int(os.environ.get("OMNI_ROUNDS", "2"))
    counted = 0
    while counted < want and time.time() < deadline:
        row = {"name": "omni_round", "round": counted}
        for name, fn, (ks, (a0, b0)) in cands:
            try:
                raw = chain_time(fn, lambda i: (a0 + jnp.float32(1e-3 * i),
                                                b0 - jnp.float32(1e-3 * i)),
                                 ks=ks, repeats=3, return_raw=True)
                dt = min_slope(raw)
                row[name + "_ms"] = round(dt * 1e3, 4)
            except Exception as ex:  # noqa: BLE001
                row[name + "_err"] = str(ex)[:160]
        for v, fn in diag_fns.items():
            try:
                raw = chain_time(fn, lambda i: (xr + jnp.float32(1e-3 * i),
                                                xi - jnp.float32(1e-3 * i)),
                                 ks=(3, 8, 14), repeats=3, return_raw=True)
                dt = min_slope(raw)
                row["diag_" + v + "_ms"] = round(dt * 1e3, 4)
            except Exception as ex:  # noqa: BLE001
                row["diag_" + v + "_err"] = str(ex)[:160]
        ctrl = row.get("fs_blocked_ms", -1.0)
        # Round validity (r4): control in band AND every slope in the
        # round physically possible — one negative/sub-floor entry
        # means congestion moved WITHIN the round (r3 artifact rot:
        # res_ms -1.35, resfilt_v5_ms -6.02 recorded uninhibited).
        floor_1m = 16.0 * 16 * (1 << 20) / (400.0 * 1e9) * 1e3
        ms_vals = [v for k, v in row.items()
                   if k.endswith("_ms") and not k.startswith("diag_")]
        row["counted"] = bool(2.0 <= ctrl <= 8.0 and ms_vals
                              and all(v >= floor_1m for v in ms_vals))
        log(**row)
        if row["counted"]:
            counted += 1
        else:
            time.sleep(60)
    log(name="done", counted=counted)
    return 0 if counted else 3


if __name__ == "__main__":
    sys.exit(main())
