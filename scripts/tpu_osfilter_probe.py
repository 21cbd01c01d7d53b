"""Device probe for the pipelined aligned overlap-save kernel: does it
compile under Mosaic, is it SNR-clean, and how much faster than the
manual-DMA kernel on a real 2^23-sample stream?

Run: timeout 2400 python scripts/tpu_osfilter_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

os.makedirs(os.path.expanduser("~/.cache/jax_comp"), exist_ok=True)
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, ".")
from fftlab.bench.timing import chain_time, min_slope  # noqa: E402

OUT = "bench_artifacts/osfilter_probe.jsonl"


def log(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def main():
    from fftlab.bench.timing import stall_watchdog

    # A dead service wedges any device call forever; generous stall line
    # because cold compiles + congested readbacks sit between log rows.
    stall_watchdog(OUT, stall_s=3000.0)
    from fftlab.kernels import os_filter_vmem as m

    n = 1 << 23
    nh = 129
    rng = np.random.default_rng(2)
    h = rng.standard_normal(nh).astype(np.float32) / nh
    xr = jnp.asarray(rng.standard_normal(n), jnp.float32)
    xi = jnp.asarray(rng.standard_normal(n), jnp.float32)
    want = np.convolve(np.asarray(xr, np.float64), h.astype(np.float64))[:n]

    ctr = [0]

    def mk(i):
        ctr[0] += 1
        t = jnp.float32(1e-3 * ctr[0])
        return (xr + t, xi - t)

    variants = {
        "aligned_16k": lambda a, b: m.pallas_os_filter_split(a, b, h),
        "aligned_2k": lambda a, b: m.pallas_os_filter_split(
            a, b, h, fft_size=2048),
    }
    for name, fn in variants.items():
        t0 = time.time()
        try:
            yr, _ = jax.jit(fn)(xr, xi)
            err = np.sum((np.asarray(yr, np.float64) - want) ** 2)
            snr = 10 * np.log10(np.sum(want ** 2) / max(err, 1e-300))
            log({"name": f"{name}_compile", "ok": True,
                 "snr_db": round(float(snr), 1),
                 "compile_s": round(time.time() - t0, 1)})
        except Exception as e:
            log({"name": f"{name}_compile", "ok": False,
                 "error": str(e)[:200]})
            variants[name] = None

    os.environ["FFTLAB_OS_ALIGNED"] = "0"
    legacy = lambda a, b: m.pallas_os_filter_split(a, b, h, fft_size=2048)
    try:
        _ = jax.jit(legacy)(xr, xi)
        log({"name": "legacy_compile", "ok": True})
    except Exception as e:
        log({"name": "legacy_compile", "ok": False, "error": str(e)[:200]})
        legacy = None
    os.environ.pop("FFTLAB_OS_ALIGNED")

    run_ms: dict = {}  # THIS run's measurements (the control check
    # must never trust stale rows from the append-mode artifact —
    # review r3 finding)

    def timeit(name, fn, env=None):
        if fn is None:
            return
        if env:
            os.environ.update(env)
        try:
            # THREE chain lengths: min_slope's deflation guard (max over
            # pairwise min-slopes) needs them — with two, a congested
            # short chain can publish an impossible speedup.
            raw = chain_time(fn, mk, ks=(8, 24, 48), repeats=4,
                             return_raw=True)
            dt = min_slope(raw)
            if dt <= 0:
                log({"name": name, "error": "non-positive min-slope"})
            else:
                run_ms[name] = round(dt * 1e3, 3)
                log({"name": name, "ms": run_ms[name],
                     "gsps": round(2 * n / dt / 1e9, 3)})
        except Exception as e:
            log({"name": name, "error": str(e)[:160]})
        finally:
            if env:
                for k in env:
                    os.environ.pop(k, None)

    from fftlab.bench.timing import copy_bandwidth, wait_healthy

    # Try the strict two-in-band gate for a bounded slice of the wait
    # budget, then fall back ADVISORY (the A/B-validated pattern): on a
    # day-long congested service the strict gate never fires, while the
    # aligned_16k control (healthy value ~2.0 ms, r2 sweeps) landing in
    # its 1.5-8 ms plausibility window proves the round anyway.
    wait_s = float(os.environ.get("PROBE_WAIT_S", "7200"))
    healthy = wait_healthy(deadline_s=min(wait_s, 1800.0), log=log)
    if not healthy:
        bw = copy_bandwidth()
        log({"name": "health_advisory", "gbps": round(bw, 1),
             "note": "strict gate never fired; proceeding, counting by "
                     "the aligned_16k control window"})
    timeit("aligned_16k", variants.get("aligned_16k"))
    timeit("aligned_2k", variants.get("aligned_2k"))
    timeit("legacy_2k", legacy, env={"FFTLAB_OS_ALIGNED": "0"})
    if not healthy:
        ctrl = run_ms.get("aligned_16k", -1.0)
        if not (1.5 <= ctrl <= 8.0):
            log({"name": "probe_done", "healthy": False,
                 "control_ms": ctrl})
            # 3 = retryable: the advisory round failed its control.
            return 3
    log({"name": "probe_done", "healthy": bool(healthy),
         "advisory": not healthy})
    return 0


if __name__ == "__main__":
    sys.exit(main())
