"""Headline benchmark: batched 1M-point complex FFT throughput per chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor (BASELINE.md): the reference's best published number is a
1M-pt c2c FFT in 4.5 ms on an RTX 3090 via cuFFT (README.md:205), i.e.
2^20 / 4.5e-3 = 0.233 Gsamples/s. `vs_baseline` is the speedup over that.

The transform runs on the split re/im fast path (algos/split_stockham.py)
— no complex dtype ever reaches the device (TPUs have no native complex;
this environment's TPU backend rejects complex64 outright).

Methodology mirrors the reference benchmark harness (benchmark_all.c:
119-131): warm-up run (compile), timed iterations with device sync,
median-of-k — plus an accuracy gate: the float32 result must reach
>= 100 dB SNR against the float64 numpy oracle or the run reports failure
(benchmark_all.c:152-157 analog).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fftlab.algos.split_stockham import fft_split

    n = 1 << 20
    platform = jax.devices()[0].platform
    batch = 16 if platform == "tpu" else 2
    iters = 10 if platform == "tpu" else 3
    # The fused-stage Pallas pipeline (kernels/stage_fused.py) measures
    # within noise of the einsum path at this size (3.34 vs 3.37 GS/s);
    # the einsum path has proven hang-free on this backend, so the
    # unattended headline run uses it. Set FFTLAB_BENCH_PIPELINE=1 to
    # bench the Pallas pipeline instead.
    import os as _os

    if platform == "tpu" and _os.environ.get("FFTLAB_BENCH_PIPELINE"):
        from fftlab.kernels.stage_fused import fft_split_pipeline

        def fft_fn(a, b):
            return fft_split_pipeline(a, b, factors=(64, 128, 128))
    else:
        fft_fn = fft_split

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((batch, n)), dtype=jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), dtype=jnp.float32)
    fn = jax.jit(fft_fn)

    # Accuracy gate on one row (float32 SNR regime, simd_fft.c:362 analog).
    gr, gi = fn(xr[:1], xi[:1])
    got = np.asarray(gr[0], dtype=np.float64) + 1j * np.asarray(gi[0], dtype=np.float64)
    want = np.fft.fft(
        np.asarray(xr[0], dtype=np.float64) + 1j * np.asarray(xi[0], dtype=np.float64)
    )
    snr = 10 * np.log10(
        np.sum(np.abs(want) ** 2) / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )
    if snr < 100.0:
        print(json.dumps({
            "metric": "fft_1m_batched_throughput", "value": 0.0,
            "unit": "Gsamples/s", "vs_baseline": 0.0,
            "error": f"accuracy gate failed: SNR {snr:.1f} dB < 100 dB",
        }))
        return

    # Timing protocol for the tunneled device: (a) inputs VARY per
    # iteration (the runtime memoizes repeated identical computations),
    # (b) completion is forced by a one-element READBACK (block_until_
    # ready can return early on this backend), and (c) the per-iteration
    # cost is the SLOPE between two batch sizes, cancelling the fixed
    # dispatch/readback round-trip latency.
    variants = [(xr + float(i) * 1e-3, xi - float(i) * 1e-3)
                for i in range(iters)]
    jax.block_until_ready(variants)
    _ = np.asarray(fn(*variants[0])[0][:1, :1])  # compile + warm + sync

    def run(k: int) -> float:
        t0 = time.perf_counter()
        outs = [fn(*variants[i % iters]) for i in range(k)]
        _ = np.asarray(outs[-1][0][:1, :1])
        return time.perf_counter() - t0

    slopes = []
    for _ in range(3):
        k1, k2 = max(iters // 3, 1), iters
        slopes.append((run(k2) - run(k1)) / (k2 - k1))
    dt = float(np.median(slopes))
    gsps = batch * n / dt / 1e9

    baseline_gsps = (1 << 20) / 4.5e-3 / 1e9  # RTX 3090 cuFFT anchor
    print(json.dumps({
        "metric": "fft_1m_batched_throughput",
        "value": round(gsps, 4),
        "unit": "Gsamples/s",
        "vs_baseline": round(gsps / baseline_gsps, 3),
        "detail": {
            "batch": batch, "n": n, "ms_per_batch": round(dt * 1e3, 3),
            "snr_db": round(float(snr), 1), "platform": platform,
            "baseline": "RTX3090 cuFFT 1M-pt in 4.5ms (README.md:205)",
        },
    }))


if __name__ == "__main__":
    main()
