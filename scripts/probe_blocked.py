"""Compile-probe the blocked-intermediate kernel variants on the real
device, one variant per PROCESS so a Mosaic hang can be killed without
wedging anything else (this backend's known failure mode is a compile
that never returns — docs/performance.md).

Run:  timeout 600 python scripts/probe_blocked.py fs_blocked
      timeout 600 python scripts/probe_blocked.py fs_blocked_w256
      timeout 900 python scripts/probe_blocked.py ts_blocked

Each probe compiles + executes ONE small-batch transform and checks SNR
against numpy, printing `OK <name> snr=<dB> <seconds>s` on success.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "fs_blocked"
    os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
    import jax

    # Share the persistent compile cache with scripts/tpu_session.py so
    # probe compiles carry over to the measurement run.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    t0 = time.time()
    if name == "fs_filter_blocked":
        from fftlab.kernels.fourstep_vmem import spectral_filter_large

        import jax.numpy as jnp
        import numpy as _np

        n = 1 << 18
        rng0 = _np.random.default_rng(1)
        hr = jnp.asarray(rng0.standard_normal(n), jnp.float32)
        hz = jnp.zeros(n, jnp.float32)
        fn = lambda a, b: spectral_filter_large(a, b, hr, hz, blocked=True)
    elif name == "ts_blocked":
        from fftlab.kernels.threestep_vmem import fft_split_huge

        n = 1 << 23
        fn = lambda a, b: fft_split_huge(a, b, blocked=True)
    elif name in ("fs_blocked", "fs_blocked_w256"):
        from fftlab.kernels.fourstep_vmem import fft_split_large

        n = 1 << 18
        kw = {"blocked": True}
        if name.endswith("w256"):
            kw["width"] = 256
        fn = lambda a, b: fft_split_large(a, b, **kw)
    elif name == "stft_small":
        return _probe_stft_small(t0)
    elif name == "os_batched":
        return _probe_os_batched(t0)
    else:
        raise SystemExit(f"unknown probe {name!r}")

    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((1, n)), jnp.float32)
    yr, yi = fn(xr, xi)
    got = np.asarray(yr[0], np.float64) + 1j * np.asarray(yi[0], np.float64)
    if name == "fs_filter_blocked":
        import numpy as _np2
        rng0 = _np2.random.default_rng(1)
        h = rng0.standard_normal(n)
        x = (np.asarray(xr[0], np.float64) + 1j * np.asarray(xi[0], np.float64))
        want = np.fft.ifft(np.fft.fft(x) * h)
    else:
        want = np.fft.fft(np.asarray(xr[0], np.float64)
                          + 1j * np.asarray(xi[0], np.float64))
    snr = 10 * np.log10(np.sum(abs(want) ** 2)
                        / max(np.sum(abs(got - want) ** 2), 1e-300))
    status = "OK" if snr > 100 else "BAD-SNR"
    print(f"{status} {name} snr={snr:.1f}dB {time.time()-t0:.0f}s",
          flush=True)


def _probe_stft_small(t0):
    """Welch-class small-frame STFT kernel (256-pt frames, 50% overlap)."""
    import jax.numpy as jnp

    from fftlab.core.window import hann
    from fftlab.kernels.stft_vmem import pallas_stft_split

    rng = np.random.default_rng(0)
    x = rng.standard_normal(1 << 16).astype(np.float32)
    yr, yi = pallas_stft_split(jnp.asarray(x), 256, 128)
    got = np.asarray(yr) + 1j * np.asarray(yi)
    w = hann(256)
    n_frames = (len(x) - 256) // 128 + 1
    want = np.stack([
        np.fft.rfft(x[k * 128: k * 128 + 256].astype(np.float64) * w)
        for k in range(n_frames)
    ])
    snr = 10 * np.log10(np.sum(abs(want) ** 2)
                        / max(np.sum(abs(got[: n_frames] - want) ** 2),
                              1e-300))
    status = "OK" if snr > 100 else "BAD-SNR"
    print(f"{status} stft_small snr={snr:.1f}dB {time.time()-t0:.0f}s",
          flush=True)


def _probe_os_batched(t0):
    """Batched-channel fused overlap-save filter kernel."""
    import jax.numpy as jnp

    from fftlab.kernels.os_filter_vmem import pallas_os_filter_split

    rng = np.random.default_rng(0)
    C, n, nh = 3, 1 << 16, 129
    xr = jnp.asarray(rng.standard_normal((C, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((C, n)), jnp.float32)
    h = rng.standard_normal(nh) / nh
    yr, yi = pallas_os_filter_split(xr, xi, h, fft_size=2048)
    worst = 1e9
    for c in range(C):
        w = np.convolve(np.asarray(xr[c], np.float64), h)[:n]
        snr = 10 * np.log10(np.sum(w ** 2)
                            / max(np.sum((np.asarray(yr[c]) - w) ** 2),
                                  1e-300))
        worst = min(worst, snr)
    status = "OK" if worst > 100 else "BAD-SNR"
    print(f"{status} os_batched snr={worst:.1f}dB {time.time()-t0:.0f}s",
          flush=True)


if __name__ == "__main__":
    main()
