"""Consolidated device-tuning session: run every pending measurement in
ONE process (shared compile cache), health-gated, results to JSONL.

The tunneled TPU service has multi-tenant congestion windows where
effective bandwidth drops >20x and any timing is garbage; this script
waits for a healthy window (copy-chain bandwidth > 200 GB/s) before
each measurement and stamps the health reading next to every result.

Run: timeout 3000 python scripts/tpu_session.py [out.jsonl]
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

OUT = sys.argv[1] if len(sys.argv) > 1 else "bench_artifacts/session.jsonl"
os.makedirs(os.path.dirname(OUT) or ".", exist_ok=True)


def log(rec: dict):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


_HX = jnp.ones((16, 1 << 20), jnp.float32)
_HY = jnp.ones((16, 1 << 20), jnp.float32)
_COUNTER = [0]  # monotonic: repeated i values would hit the backend's
                # computation memoization and fake the timing


def _next() -> int:
    _COUNTER[0] += 1
    return _COUNTER[0]


def bandwidth() -> float:
    mk = lambda i: (_HX + jnp.float32(_next() * 1e-3),
                    _HY - jnp.float32(_next() * 1e-3))
    raw = chain_time(lambda a, b: (a + 1.0, b + 1.0), mk, ks=(4, 64),
                     repeats=3, return_raw=True)
    dt = min_slope(raw)  # 2-repeat medians went negative under spikes
    if dt <= 0:
        return -1.0
    return 2 * 2 * 4 * 16 * (1 << 20) / dt / 1e9


def wait_healthy(tries=30) -> float:
    for _ in range(tries):
        bw = bandwidth()
        print(f"  [health {bw:.0f} GB/s]", flush=True)
        if 100 < bw < 2000:  # >2000 = measurement artifact, not health
            return bw
        time.sleep(25)
    return -1.0


def measure(name, step, mk, total_samples, ks=(16, 96)):
    bw = wait_healthy()
    if bw < 0:
        log({"name": name, "error": "no healthy window"})
        return
    try:
        raw = chain_time(step, mk, ks=ks, repeats=5, return_raw=True)
    except Exception as e:
        log({"name": name, "error": str(e)[:160]})
        return
    kk = sorted(raw)
    ts = [(b - a) / (kk[-1] - kk[0])
          for a, b in zip(raw[kk[0]], raw[kk[-1]])]
    lo, hi = min(ts), max(ts)
    dt = min_slope(raw)  # congestion only adds time: min-slope is robust
    if dt <= 0:
        log({"name": name, "error": "non-positive min-slope",
             "health_gbps": round(bw, 0)})
        return
    rec = {"name": name, "ms": round(dt * 1e3, 3),
           "ms_spread": [round(lo * 1e3, 3), round(hi * 1e3, 3)],
           "gsps": round(total_samples / dt / 1e9, 3),
           "health_gbps": round(bw, 0)}
    if hi / dt > 2.0:
        rec["noisy"] = True
    log(rec)


def main():
    rng = np.random.default_rng(0)
    n = 1 << 20
    B = 16
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    mk = lambda i: (xr + jnp.float32(1e-3 * _next()), xi - jnp.float32(1e-3 * _next()))
    scale = jnp.float32(1.0 / np.sqrt(n))

    import fftlab.kernels.fourstep_vmem as fv
    from fftlab.algos.split_stockham import fft_split

    # -- 1M variants (highest-value first: the blocked layouts are the
    # round's lever; baselines re-run after) ------------------------------
    orig_factors = fv._split_factors

    def step_fs(a, b):
        yr, yi = fv.fft_split_large(a, b)
        return yr * scale, yi * scale

    def step_fs_w256(a, b):
        yr, yi = fv.fft_split_large(a, b, width=256)
        return yr * scale, yi * scale

    def step_fs_blocked(a, b):
        yr, yi = fv.fft_split_large(a, b, blocked=True)
        return yr * scale, yi * scale

    def step_fs_blocked_w256(a, b):
        yr, yi = fv.fft_split_large(a, b, blocked=True, width=256)
        return yr * scale, yi * scale

    measure("fs_blocked_1m", step_fs_blocked, mk, B * n)
    measure("fs_blocked_w256_1m", step_fs_blocked_w256, mk, B * n)
    measure("fs_base_1m", step_fs, mk, B * n)
    measure("fs_w256_1m", step_fs_w256, mk, B * n)

    def step_einsum(a, b):
        yr, yi = fft_split(a, b)
        return yr * scale, yi * scale

    measure("einsum_1m", step_einsum, mk, B * n)

    # -- fused large filter ----------------------------------------------
    h = jnp.asarray(rng.standard_normal(n), jnp.float32)
    hz = jnp.zeros(n, jnp.float32)

    def step_filt(a, b):
        yr, yi = fv.spectral_filter_large(a, b, h, hz)
        return yr, yi

    measure("filter_large_1m", step_filt, mk, B * n)

    def step_filt_blk(a, b):
        yr, yi = fv.spectral_filter_large(a, b, h, hz, blocked=True)
        return yr, yi

    measure("filter_blocked_1m", step_filt_blk, mk, B * n)

    # -- 16M single -------------------------------------------------------
    n16 = 1 << 24
    k1, k2 = jax.random.split(jax.random.key(1))
    sr = jax.random.normal(k1, (1, n16), jnp.float32)
    si = jax.random.normal(k2, (1, n16), jnp.float32)
    mk16 = lambda i: (sr + jnp.float32(1e-3 * _next()), si - jnp.float32(1e-3 * _next()))
    s16 = jnp.float32(1.0 / np.sqrt(n16))

    # (fs kernel caps at 2^22 — the 16M single runs einsum; a 4M batched
    # kernel point covers the large-kernel scaling instead)
    n4 = 1 << 22
    k3, k4 = jax.random.split(jax.random.key(2))
    fr4 = jax.random.normal(k3, (4, n4), jnp.float32)
    fi4 = jax.random.normal(k4, (4, n4), jnp.float32)
    mk4 = lambda i: (fr4 + jnp.float32(1e-3 * _next()),
                     fi4 - jnp.float32(1e-3 * _next()))
    s4 = jnp.float32(1.0 / np.sqrt(n4))

    def step_fs4(a, b):
        yr, yi = fv.fft_split_large(a, b)
        return yr * s4, yi * s4

    measure("fs_4m_batch4", step_fs4, mk4, 4 * n4, ks=(8, 48))

    from fftlab.kernels.threestep_vmem import fft_split_huge

    def step_h16(a, b):
        yr, yi = fft_split_huge(a, b)
        return yr * s16, yi * s16

    measure("threestep_16m", step_h16, mk16, n16, ks=(8, 48))

    def step_h16_blk(a, b):
        yr, yi = fft_split_huge(a, b, blocked=True)
        return yr * s16, yi * s16

    measure("threestep_blocked_16m", step_h16_blk, mk16, n16, ks=(8, 48))

    def step_e16(a, b):
        yr, yi = fft_split(a, b)
        return yr * s16, yi * s16

    measure("einsum_16m", step_e16, mk16, n16, ks=(8, 48))

    # -- factor-split variants (low priority) -----------------------------
    # _split_factors is read at TRACE time; the jit cache is keyed only
    # on avals/statics, so each variant must drop compiled entries or it
    # would silently re-run the base kernel (code-review r2 finding).
    fv._split_factors = lambda L: (min(128, L), L // min(128, L))
    jax.clear_caches()
    measure("fs_fa128_1m", step_fs, mk, B * n)
    fv._split_factors = lambda L: (64, L // 64)
    jax.clear_caches()
    measure("fs_fa64_1m", step_fs, mk, B * n)
    fv._split_factors = orig_factors
    jax.clear_caches()

    # -- 4K/8K crossover: pallas_vmem multirow vs einsum ------------------
    from fftlab.kernels.fft_vmem import pallas_fft_split

    for nn in (4096, 8192):
        BB = (1 << 22) // nn
        ka, kb = jax.random.split(jax.random.key(nn))
        ar = jax.random.normal(ka, (BB, nn), jnp.float32)
        ai = jax.random.normal(kb, (BB, nn), jnp.float32)
        mkx = lambda i: (ar + jnp.float32(1e-3 * _next()), ai - jnp.float32(1e-3 * _next()))
        sc = jnp.float32(1.0 / np.sqrt(nn))

        def step_v(a, b):
            yr, yi = pallas_fft_split(a, b)
            return yr * sc, yi * sc

        def step_e(a, b):
            yr, yi = fft_split(a, b)
            return yr * sc, yi * sc

        measure(f"vmem_{nn}", step_v, mkx, BB * nn)
        measure(f"einsum_{nn}", step_e, mkx, BB * nn)

    log({"name": "session_done"})


if __name__ == "__main__":
    main()
