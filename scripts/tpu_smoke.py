"""TPU smoke test: runs every device fast path once on the real chip
with correctness gates; prints a PASS/FAIL summary line per path.

Run: python scripts/tpu_smoke.py          (takes minutes: remote compiles)

This is the hardware-facing counterpart of the CPU test suite — the
paths here are exactly what a production deployment exercises, all on
split re/im planes (no complex dtype; see docs/performance.md for the
backend's constraints).
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def snr(got, want):
    return 10 * np.log10(
        np.sum(np.abs(want) ** 2)
        / max(np.sum(np.abs(got - want) ** 2), 1e-300)
    )


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    results = []

    def check(name, db, floor=100.0):
        ok = db > floor
        results.append((name, db, ok))
        print(f"{'PASS' if ok else 'FAIL'} {name}: {db:.1f} dB",
              flush=True)

    print(f"platform: {jax.devices()[0]}", flush=True)

    # 1. split-Stockham batched FFT
    from fftlab.algos.split_stockham import fft_split

    n = 1 << 16
    xr = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((2, n)), jnp.float32)
    t0 = time.time()
    yr, yi = jax.jit(fft_split)(xr, xi)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    want = np.fft.fft(np.asarray(xr, np.float64) + 1j * np.asarray(xi, np.float64))
    check(f"fft_split 64K ({time.time()-t0:.0f}s)", snr(got, want))

    # 2. rfft_split
    from fftlab.algos.split_stockham import rfft_split

    x = jnp.asarray(rng.standard_normal((2, 4096)), jnp.float32)
    rr, ri = jax.jit(rfft_split)(x)
    got = np.asarray(rr, np.float64) + 1j * np.asarray(ri, np.float64)
    check("rfft_split 4K", snr(got, np.fft.rfft(np.asarray(x, np.float64))))

    # 3. Bluestein prime size
    from fftlab.algos.bluestein import bluestein_fft_split

    np_ = 10007
    pr = jnp.asarray(rng.standard_normal(np_), jnp.float32)
    pi = jnp.asarray(rng.standard_normal(np_), jnp.float32)
    br, bi = jax.jit(bluestein_fft_split)(pr, pi)
    got = np.asarray(br, np.float64) + 1j * np.asarray(bi, np.float64)
    want = np.fft.fft(np.asarray(pr, np.float64) + 1j * np.asarray(pi, np.float64))
    check("bluestein_split prime 10007", snr(got, want), floor=90.0)

    # 4. Pallas VMEM FFT kernel
    from fftlab.kernels.fft_vmem import pallas_fft_split

    kr = jnp.asarray(rng.standard_normal((2, 16384)), jnp.float32)
    ki = jnp.asarray(rng.standard_normal((2, 16384)), jnp.float32)
    yr, yi = pallas_fft_split(kr, ki)
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    want = np.fft.fft(np.asarray(kr, np.float64) + 1j * np.asarray(ki, np.float64))
    check("pallas_fft_split 16K", snr(got, want))

    # 5. Pallas streaming STFT kernel
    from fftlab.core.window import hann
    from fftlab.kernels.stft_vmem import pallas_stft_split

    sig = np.asarray(rng.standard_normal(1 << 18), np.float32)
    sr_, si_ = pallas_stft_split(jnp.asarray(sig), 2048, 512)
    got = np.asarray(sr_[:4], np.float64) + 1j * np.asarray(si_[:4], np.float64)
    w = hann(2048)
    want = np.stack([
        np.fft.rfft(sig[k * 512 : k * 512 + 2048].astype(np.float64) * w)
        for k in range(4)
    ])
    check("pallas_stft 2048/512", snr(got, want))

    # 6. Fused DMA overlap-save filter kernel
    from fftlab.kernels.os_filter_vmem import pallas_os_filter_split

    fs = np.asarray(rng.standard_normal(1 << 18), np.float32)
    h = rng.standard_normal(129)
    fr, _ = pallas_os_filter_split(jnp.asarray(fs), jnp.zeros(1 << 18, jnp.float32), h)
    got = np.asarray(fr[:50000], np.float64)
    want = np.convolve(fs[: 50000 + 129].astype(np.float64), h)[:50000]
    check("pallas_os_filter 129 taps", snr(got, want))

    # 7. Two-pass large-n kernel (round 2)
    from fftlab.kernels.fourstep_vmem import fft_split_large

    lr = jnp.asarray(rng.standard_normal((1, 1 << 20)), jnp.float32)
    li = jnp.asarray(rng.standard_normal((1, 1 << 20)), jnp.float32)
    yr, yi = fft_split_large(lr, li)
    got = np.asarray(yr[0], np.float64) + 1j * np.asarray(yi[0], np.float64)
    want = np.fft.fft(np.asarray(lr[0], np.float64)
                      + 1j * np.asarray(li[0], np.float64))
    check("fourstep_vmem 1M", snr(got, want))

    # 8. Fused large spectral filter (4-pass sandwich)
    from fftlab.kernels.fourstep_vmem import spectral_filter_large

    hmask = np.zeros(1 << 20, np.float32)
    hmask[: 1 << 14] = 1.0
    zr, zi = spectral_filter_large(
        lr, li, jnp.asarray(hmask), jnp.zeros(1 << 20, jnp.float32)
    )
    x0 = (np.asarray(lr[0], np.float64)
          + 1j * np.asarray(li[0], np.float64))
    want = np.fft.ifft(np.fft.fft(x0) * hmask.astype(np.float64))
    got = np.asarray(zr[0], np.float64) + 1j * np.asarray(zi[0], np.float64)
    check("spectral_filter_large 1M", snr(got, want))

    # 9. Three-pass huge-n kernel
    from fftlab.kernels.threestep_vmem import fft_split_huge

    hr9 = jnp.asarray(rng.standard_normal((1, 1 << 23)), jnp.float32)
    hi9 = jnp.asarray(rng.standard_normal((1, 1 << 23)), jnp.float32)
    yr, yi = fft_split_huge(hr9, hi9)
    got = np.asarray(yr[0], np.float64) + 1j * np.asarray(yi[0], np.float64)
    want = np.fft.fft(np.asarray(hr9[0], np.float64)
                      + 1j * np.asarray(hi9[0], np.float64))
    check("threestep_vmem 8M", snr(got, want))

    failed = [r for r in results if not r[2]]
    print(f"\n{len(results) - len(failed)}/{len(results)} paths PASS")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
