"""Paired-ratio device A/B: the congestion-robust comparator.

Whole-round min-slope comparisons need a clean window somewhere in the
round; on a service whose load swings per-minute they rarely land
(r4: 30+ rounds, ~zero counted). This probe instead alternates the
two arms of each question at SINGLE-CHAIN granularity — A, B, A, B …
with each measurement one dispatch + one-element readback — and
aggregates the per-adjacent-pair time ratio A_i/B_i by median.
Congestion is approximately common-mode across adjacent ~1 s
measurements, so the ratio concentrates even when the absolute times
swing 10x (the classic paired experimental design).

Questions (arm_a vs arm_b, k=28 chains at 16x2^20 / k=8 at 1x2^24 — long chains
amortize the fixed dispatch+readback cost that would damp
ratios toward 1):
  v6_3x     vs v6_hi        MXU pass count on the zero-transpose kernel
  v4_3x     vs v4_hi        same on the phase-A-transpose kernel
  v6_hi     vs fs_blocked   one-residency vs two-pass (the r3 question)
  fsfilt_ln vs fsfilt_blk   transpose-free pass 2 in the sandwich
  resfilt5  vs fsfilt_blk   fused one-residency sandwich vs two-launch
  ts_lanes  vs ts_r128      transpose-free pass 3 at 16M

Output per question: median ratio, IQR, n_pairs. ratio < 1 means arm_a
is faster. Appends to bench_artifacts/paired_ab.jsonl.
"""

from __future__ import annotations

import json
import os
import statistics
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

ART = "bench_artifacts/paired_ab.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def main() -> int:
    from jax import lax

    from fftlab.bench.timing import stall_watchdog
    from fftlab.core.types import FORWARD
    from fftlab.kernels.fourstep_vmem import (
        fft_split_large,
        spectral_filter_large,
    )
    from fftlab.kernels.resident_vmem import (
        fft_split_resident,
        spectral_filter_resident_v5,
        spectral_filter_resident_v7,
    )
    from fftlab.kernels.threestep_vmem import fft_split_huge

    stall_watchdog(ART, stall_s=2400.0)
    assert jax.devices()[0].platform == "tpu"

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

    def res(layout, prec, out_rows=None, dimsem=False):
        def fn(a, b):
            # env read at TRACE time inside _dimsem(); pin per candidate
            prev = os.environ.get("FFTLAB_RES_DIMSEM")
            os.environ["FFTLAB_RES_DIMSEM"] = "1" if dimsem else "0"
            try:
                return fft_split_resident(
                    a, b, FORWARD, scale=scale, layout=layout, prec=prec,
                    out_rows=out_rows)
            finally:
                if prev is None:
                    os.environ.pop("FFTLAB_RES_DIMSEM", None)
                else:
                    os.environ["FFTLAB_RES_DIMSEM"] = prev

        return fn

    fns = {
        "fs_blocked": (lambda a, b: fft_split_large(
            a, b, FORWARD, blocked=True, scale=scale), 28, (xr, xi)),
        "v4_hi": (res("v4", None), 28, (xr, xi)),
        "v4_r256": (res("v4", None, out_rows=256), 28, (xr, xi)),
        "v4_ds": (res("v4", None, dimsem=True), 28, (xr, xi)),
        "v4_3x": (res("v4", "3x"), 28, (xr, xi)),
        "v6_hi": (res("v6", None), 28, (xr, xi)),
        "v6_3x": (res("v6", "3x"), 28, (xr, xi)),
        "fsfilt_blocked": (lambda a, b: spectral_filter_large(
            a, b, hr, hi, blocked=True, lanes=False), 20, (xr, xi)),
        "fsfilt_lanes": (lambda a, b: spectral_filter_large(
            a, b, hr, hi, blocked=True, lanes=True), 20, (xr, xi)),
        "resfilt_v5": (lambda a, b: spectral_filter_resident_v5(
            a, b, hr, hi), 20, (xr, xi)),
        "resfilt_v7": (lambda a, b: spectral_filter_resident_v7(
            a, b, hr, hi), 20, (xr, xi)),
        "resfilt_v5_3x": (lambda a, b: spectral_filter_resident_v5(
            a, b, hr, hi, prec="3x"), 20, (xr, xi)),
        "ts_r128": (lambda a, b: fft_split_huge(
            a, b, FORWARD, scale=hscale), 8, (hxr, hxi)),
        "ts_lanes": (lambda a, b: fft_split_huge(
            a, b, FORWARD, scale=hscale, lanes=True), 8, (hxr, hxi)),
        "ts_blocked": (lambda a, b: fft_split_huge(
            a, b, FORWARD, scale=hscale, blocked=True), 8, (hxr, hxi)),
    }

    QUESTIONS = [
        ("v6_3x", "v6_hi"),
        ("v4_3x", "v4_hi"),
        ("v4_r256", "v4_hi"),  # wider HBM write bursts (VERDICT r4 #2)
        ("v6_hi", "v4_hi"),    # transpose stores vs lane contractions:
                               # the 3x wash exonerated MXU passes, not
                               # v4's VPU transpose-store work
        ("v4_ds", "v4_hi"),    # parallel batch-dim semantics: lets
                               # Mosaic pipeline across rows

        ("v6_hi", "fs_blocked"),
        ("v6_3x", "fs_blocked"),
        ("fsfilt_lanes", "fsfilt_blocked"),
        ("resfilt_v5", "fsfilt_blocked"),
        ("resfilt_v7", "fsfilt_lanes"),
        ("resfilt_v7", "resfilt_v5"),
        ("resfilt_v5_3x", "resfilt_v5"),
        ("ts_lanes", "ts_r128"),
        ("ts_blocked", "ts_r128"),  # blocked intermediates: 4 of 6 HBM
                                    # edges become contiguous (VERDICT
                                    # r4 #7 pass-2 DMA shaping)
    ]
    only = os.environ.get("PAIRED_ONLY")
    if only:  # e.g. PAIRED_ONLY="ts_lanes:ts_r128,resfilt_v5:fsfilt_blocked"
        want_qs = {tuple(q.split(":")) for q in only.split(",")}
        QUESTIONS = [q for q in QUESTIONS if q in want_qs]
        fns = {n: f for n, f in fns.items()
               if any(n in q for q in QUESTIONS)}

    chainfns = {}
    for name, (fn, k, _inp) in fns.items():
        def chained(s, _fn=fn, _k=k):
            return lax.fori_loop(0, _k, lambda i, st: tuple(_fn(*st)), s)

        chainfns[name] = jax.jit(chained)
    ctr = [0]

    def measure(name) -> float:
        _fn, _k, (a0, b0) = fns[name]
        ctr[0] += 1
        t = jnp.float32(1e-3 * ctr[0])
        s = (a0 + t, b0 - t)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        out = chainfns[name](s)
        # One-ELEMENT readback, not the full plane: np.asarray on the
        # whole array shipped 64 MB device->host inside the timed
        # window (r4 advisor finding) — over a congested tunnel that
        # constant swamps the kernel delta and damps every paired
        # ratio toward 1. Indexing on-device first transfers 4 bytes.
        _ = np.asarray(out[0][0, 0])
        return time.perf_counter() - t0

    for name in fns:
        t0 = time.time()
        try:
            measure(name)
            log(name=f"warm_{name}", s=round(time.time() - t0, 1))
        except Exception as ex:  # noqa: BLE001
            log(name=f"warm_{name}", error=str(ex)[:160])

    pairs_per_pass = int(os.environ.get("PAIRED_PAIRS", "8"))
    passes = int(os.environ.get("PAIRED_PASSES", "3"))
    deadline = time.time() + float(os.environ.get("PAIRED_WAIT_S", "5400"))
    ratios: dict[tuple, list[float]] = {q: [] for q in QUESTIONS}
    for p in range(passes):
        for qa, qb in QUESTIONS:
            if time.time() > deadline:
                break
            got = []
            try:
                for _i in range(pairs_per_pass):
                    # alternate a,b back to back; both sides of a pair
                    # share (approximately) one congestion state
                    ta = measure(qa)
                    tb = measure(qb)
                    if ta > 0 and tb > 0:
                        got.append(ta / tb)
            except Exception as ex:  # noqa: BLE001
                log(name="pair_err", a=qa, b=qb, error=str(ex)[:160])
                continue
            ratios[(qa, qb)].extend(got)
            r = sorted(ratios[(qa, qb)])
            med = statistics.median(r)
            iqr = (r[3 * len(r) // 4] - r[len(r) // 4]) if len(r) >= 4 else -1
            log(name="paired", a=qa, b=qb, n=len(r),
                median_ratio=round(med, 4), iqr=round(iqr, 4),
                a_faster=bool(med < 1.0))
    # final verdict lines
    for (qa, qb), r in ratios.items():
        if not r:
            continue
        r = sorted(r)
        log(name="verdict", a=qa, b=qb, n=len(r),
            median_ratio=round(statistics.median(r), 4),
            p25=round(r[len(r) // 4], 4),
            p75=round(r[3 * len(r) // 4], 4))
    return 0


if __name__ == "__main__":
    sys.exit(main())
