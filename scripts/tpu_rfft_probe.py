"""Decompose the rfft_2m cost (first-ever measurement: 38 ms for
8 x 2M real points = 3% of floor — systematic, tight spread).

Suspect: the pack-two-reals deinterleave x[..., 0::2] / x[..., 1::2]
is a stride-2 LANE gather on TPU (the same class as the 10x
gather-framing finding, core/framing.py). Candidates timed here:

  deint_slice    x[..., 0::2], x[..., 1::2]         (current)
  deint_reshape  x.reshape(.., m, 2) -> [..., 0] / [..., 1]
  deint_xpose    x.reshape(.., m, 2) -> transpose minor pair
  unpack_only    paired Hermitian unpack fed pre-split planes
  halffft_only   the m-point c2c via the dispatch route (v4)
  rfft_full      rfft_split end to end
  reint_stack    irfft's stack+reshape re-interleave

Appends to bench_artifacts/rfft_probe.jsonl.
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

ART = "bench_artifacts/rfft_probe.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def main() -> int:
    from fftlab.bench.timing import chain_time, min_slope, stall_watchdog

    stall_watchdog(ART, stall_s=2400.0)
    assert jax.devices()[0].platform == "tpu"
    from fftlab.algos.split_stockham import rfft_split
    from fftlab.plan.dispatch import fft_split_auto

    B, n = 8, 1 << 21
    m = n // 2
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    er = jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
    ei = jnp.asarray(rng.standard_normal((B, m)), jnp.float32)
    eps = jnp.float32(1e-30)

    def deint_slice(a):
        zr, zi = a[..., 0::2], a[..., 1::2]
        return (a + eps * (zr[0, 0] + zi[0, 0]),)

    def deint_reshape(a):
        a2 = a.reshape(B, m, 2)
        zr, zi = a2[..., 0], a2[..., 1]
        return (a + eps * (zr[0, 0] + zi[0, 0]),)

    def deint_xpose(a):
        a3 = jnp.transpose(a.reshape(B, m, 2), (0, 2, 1))
        return (a + eps * (a3[0, 0, 0] + a3[0, 1, 0]),)

    def unpack_only(a):
        # the paired unpack applied to pre-split planes (no deint, no
        # half FFT): replicate rfft_split's epilogue math
        half = m // 2
        Zlr, Zli = er[..., : half + 1], ei[..., : half + 1]
        Zhr = jnp.concatenate([er[..., :1], er[..., half:][..., ::-1]],
                              axis=-1)
        Zhi = jnp.concatenate([ei[..., :1], ei[..., half:][..., ::-1]],
                              axis=-1)
        Er, Ei = 0.5 * (Zlr + Zhr), 0.5 * (Zli - Zhi)
        Or_, Oi = 0.5 * (Zli + Zhi), -0.5 * (Zlr - Zhr)
        k = np.arange(half + 1, dtype=np.float64)
        w = np.exp(-2j * np.pi * k / n)
        wr = jnp.asarray(w.real.astype(np.float32))
        wi = jnp.asarray(w.imag.astype(np.float32))
        WOr = Or_ * wr - Oi * wi
        WOi = Or_ * wi + Oi * wr
        low_r, low_i = Er + WOr, Ei + WOi
        hr_, hi_ = Er - WOr, -(Ei - WOi)
        Xr = jnp.concatenate([low_r, hr_[..., 1:half][..., ::-1],
                              hr_[..., :1]], axis=-1)
        Xi = jnp.concatenate([low_i, hi_[..., 1:half][..., ::-1],
                              hi_[..., :1]], axis=-1)
        return (a + eps * (Xr[0, 0] + Xi[0, 0]),)

    def halffft_only(a):
        yr, yi = fft_split_auto(er + eps * a[0, 0], ei)
        return (a + eps * (yr[0, 0] + yi[0, 0]),)

    def rfft_full(a):
        Xr, Xi = rfft_split(a)
        return (a + eps * (Xr[0, 0] + Xi[0, 0]),)

    def reint_stack(a):
        out = jnp.stack([er + eps * a[0, 0], ei], axis=-1)
        out = out.reshape(B, n)
        return (a + eps * out[0, 0],)

    cands = [("deint_slice", deint_slice),
             ("deint_reshape", deint_reshape),
             ("deint_xpose", deint_xpose),
             ("unpack_only", unpack_only),
             ("halffft_only", halffft_only),
             ("rfft_full", rfft_full),
             ("reint_stack", reint_stack)]

    for name, fn in cands:
        t0 = time.time()
        try:
            jax.jit(fn)(x)[0].block_until_ready()
            log(name=f"warm_{name}", s=round(time.time() - t0, 1))
        except Exception as ex:  # noqa: BLE001
            log(name=f"warm_{name}", error=str(ex)[:250])

    deadline = time.time() + float(os.environ.get("RFFT_WAIT_S", "7200"))
    want = int(os.environ.get("RFFT_ROUNDS", "2"))
    counted = 0
    while counted < want and time.time() < deadline:
        row = {"name": "rfft_round", "round": counted}
        for name, fn in cands:
            try:
                raw = chain_time(fn, lambda i: (x + jnp.float32(1e-3 * i),),
                                 ks=(3, 8, 14), repeats=3, return_raw=True)
                dt = min_slope(raw)
                row[name + "_ms"] = round(dt * 1e3, 4)
            except Exception as ex:  # noqa: BLE001
                row[name + "_err"] = str(ex)[:160]
        # control: the half FFT through the v4 route (healthy ~0.9 ms
        # for 8 x 1M; generous window for congestion)
        ctrl = row.get("halffft_only_ms", -1.0)
        row["counted"] = bool(0.4 <= ctrl <= 5.0)
        log(**row)
        if row["counted"]:
            counted += 1
        else:
            time.sleep(45)
    log(name="done", counted=counted)
    return 0 if counted else 3


if __name__ == "__main__":
    sys.exit(main())
