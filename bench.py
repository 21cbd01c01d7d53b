"""Headline benchmark suite — every published performance claim as a
reproducible artifact (benchmark_all.c:119-211 analog, hardened for this
backend).

Prints the headline JSON line INCREMENTALLY — once the bandwidth
pre-flight lands, again after every 1M candidate path, and again after
every sub-bench (intermediate lines carry `"partial": true`; the final
line doesn't). The driver keeps the last complete line of stdout, so
even an external kill mid-suite captures everything measured up to
that moment (the r02 lesson: rc=124 must still yield a metric).
The top-level metric is the batched 1M-point FFT throughput (the
BASELINE.md north star); `detail` carries the full suite, each entry
with its SNR gate, run-to-run spread, and roofline fraction against
the bandwidth measured IN THIS RUN:

  bandwidth        elementwise-copy chain  -> effective HBM GB/s
  fft_1m_batched   batch x 2^20 c2c FFT (split f32, best device path)
  fft_16m_single   one 2^24 transform (four-step, single chip)
  serving_filter   fused overlap-save FIR (kernels/os_filter_vmem)
  stft             Pallas streaming STFT vs the XLA gather-framing path
  rfft_2m          r2c plan (pack-two-reals through the half-size route)

Timing = chain_time (fftlab/bench/timing.py): k applications chained in
one jitted fori_loop, one dispatch+readback per measurement, slope over
three k values. This is the only protocol that survives the tunnel's
dispatch jitter; inputs vary per repeat so the backend's computation
memoization never hits.

Baseline anchor (BASELINE.md): the reference's best published number is
1M points in 4.5 ms on an RTX 3090 via cuFFT = 0.233 GS/s;
`vs_baseline` is the speedup over that.

Roofline accounting: a 1M-point f32 split c2c signal is 8 MB — it fits
in VMEM next to chunk workspaces, so the one-residency kernel
(kernels/resident_vmem.py) reads and writes HBM exactly once:
t_min = 1 * 16 B/pt * N / BW_measured and
roofline_fraction = t_min / t_measured. (Sizes past 2^20 can't be
resident; the 16M floor stays at 3 passes.)
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _snr_db(got: np.ndarray, want: np.ndarray) -> float:
    err = np.sum(np.abs(got - want) ** 2)
    sig = np.sum(np.abs(want) ** 2)
    return float(10 * np.log10(sig / max(err, 1e-300)))


def _spread(step, mk_state, ks, repeats=4, deadline=None, floor_ms=None):
    """chain_time repeated -> {ms (min-slope), per-repeat spread}.

    The headline `ms` is the MIN-SLOPE estimate (fftlab.bench.timing
    .min_slope): congestion on this multi-tenant service only ever adds
    time, so min-over-repeats per chain length converges to the
    uncongested cost while the median of per-repeat slopes can go
    negative under a single spike. Three chain lengths are used so the
    estimator can take the max over pairwise min-slopes — with only two,
    a short chain congested in EVERY repeat deflates the slope below
    physics (observed: 14.4 GS/s at a 2.9 ms HBM floor). The per-repeat
    slopes are still reported as the spread/noise diagnostic.

    Validity guard (r3 review): an estimate that is non-positive or
    beats `floor_ms` (the op's physical HBM floor) is a measurement
    artifact — more samples are merged instead of publishing it, and
    if the deadline runs out first the result says `floor_violation`
    rather than presenting impossible speed as real. `deadline` (abs
    time.time()) bounds the retry loop so one noisy sweep can never
    eat the suite's whole budget (the r03 watchdog lesson)."""
    import time as _time

    from fftlab.bench.timing import chain_time, min_slope, slope_valid

    raw: dict = {}
    ms = -1.0
    for attempt in range(3):
        fresh = chain_time(step, mk_state, ks=ks, repeats=repeats,
                           return_raw=True)
        for k, v in fresh.items():
            raw.setdefault(k, []).extend(v)
        kk = sorted(raw)
        slopes = [(b - a) / (kk[-1] - kk[0])
                  for a, b in zip(raw[kk[0]], raw[kk[-1]])]
        good = [t for t in slopes if t > 0]
        ms = min_slope(raw)
        n_rep = len(raw[kk[0]])
        noisy = len(good) < n_rep or (ms > 0 and (max(slopes) / ms) > 2.0)
        valid = slope_valid(ms * 1e3, floor_ms)
        out_of_time = deadline is not None and _time.time() > deadline
        if valid and (not noisy or attempt >= 1 or out_of_time):
            # noisy first round: sample once more and merge — per-k
            # minima get more chances to catch a clean window; after
            # the merge, publish whatever we have (flagged).
            r = {
                "ms": round(float(ms) * 1e3, 4),
                "ms_median": round(float(np.median(good or slopes)) * 1e3, 4),
                "ms_max": round(float(np.max(slopes)) * 1e3, 4),
                "repeats": n_rep,
            }
            if noisy:
                r["noisy"] = True
            return r
        if out_of_time:
            break
        if not valid and attempt < 2:
            _time.sleep(10)
    if ms > 0:
        # Out of budget with only a floor-violating estimate: publish
        # the floor itself as the conservative time, flagged — never
        # the impossible number.
        return {"ms": round(float(floor_ms), 4), "repeats": len(raw[kk[0]]),
                "noisy": True, "floor_violation": True,
                "deflated_ms": round(float(ms) * 1e3, 4)}
    raise RuntimeError("min-slope non-positive after merged retries "
                       "(congested service)")


def bench_bandwidth(jnp, on_tpu: bool) -> dict:
    """Effective HBM bandwidth from an elementwise copy chain."""
    shape = (16, 1 << 20) if on_tpu else (2, 1 << 14)
    nbytes = 2 * 2 * 4 * shape[0] * shape[1]  # rd+wr, 2 planes, f32

    rng = np.random.default_rng(0)
    base_r = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    base_i = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def mk(i):  # derive on device: no big host->device transfer per repeat
        t = jnp.float32(1e-3 * i)
        return (base_r + t, base_i - t)

    step = lambda a, b: (a * 1.0000001 + 1.0, b * 1.0000001 + 1.0)
    r = _spread(step, mk, ks=(16, 56, 128), repeats=3)
    r["gbps"] = round(nbytes / (r["ms"] / 1e3) / 1e9, 1)
    return r


def _measure_path(jax, jnp, fn, path, xr, xi, want, ks, repeats,
                  deadline=None, floor_ms=None):
    """SNR-gate + time one candidate FFT path. Returns a result dict.

    fn(a, b, scale=None) must return the (scaled) transform; the chain
    needs a 1/sqrt(n) normalization to keep magnitudes constant, and
    passing it through the candidate lets kernel paths fold it into
    their tables (a trailing elementwise multiply would add a whole
    HBM pass that XLA cannot fuse into a pallas_call)."""
    n = int(xr.shape[-1])
    gr, gi = jax.jit(fn)(xr[:1], xi[:1])
    # Gate on a 64K-bin slice: random input spreads energy uniformly
    # over bins, so the SNR estimate is solid — and the full spectrum
    # readback (4 MB at 1M, 64 MB at 16M) over a congested tunnel ran
    # at ~0.25 MB/s (r4: 16.7 s for 4 MB), which would burn whole row
    # budgets on device->host transfers.
    m = min(n, 1 << 16)
    got = (np.asarray(gr[0, :m], np.float64)
           + 1j * np.asarray(gi[0, :m], np.float64))
    snr = _snr_db(got, want[:m])
    if snr < 100.0:
        return {"error": f"accuracy gate failed: {snr:.1f} dB < 100",
                "snr_db": round(snr, 1), "path": path}
    scale = 1.0 / float(np.sqrt(n))  # keep chained magnitudes ~const

    def step(a, b):
        return fn(a, b, scale=scale)

    def mk(i):  # on-device variants (host->device transfer is slow here)
        t = jnp.float32(1e-3 * i)
        return (xr + t, xi - t)

    r = _spread(step, mk, ks=ks, repeats=repeats, deadline=deadline,
                floor_ms=floor_ms)
    total = int(np.prod(xr.shape))
    r["gsps"] = round(total / (r["ms"] / 1e3) / 1e9, 4)
    r["snr_db"] = round(snr, 1)
    r["path"] = path
    return r


def _crown(results: dict, min_passes: float, batch: int, n: int,
           bw_gbps: float) -> dict:
    """Best SNR-passing path so far + roofline fraction (no re-measure).

    Used for the INCREMENTAL emits while the sweep is still running —
    the driver keeps the last complete JSON line, so every partial crown
    must already be a valid, conservative artifact."""
    ok = [r for r in results.values() if "gsps" in r]
    clean = [r for r in ok if not r.get("floor_violation")]
    ok = clean or ok  # a flagged floor-clamp row only wins by default
    if not ok:
        return {"error": "no path passed (yet)", "paths": results}
    best = max(ok, key=lambda r: r["gsps"])
    out = dict(best)
    out["paths"] = results
    t_min_ms = min_passes * 16.0 * batch * n / (bw_gbps * 1e9) * 1e3
    if out["ms"] >= t_min_ms:
        out["roofline_fraction"] = round(t_min_ms / out["ms"], 3)
    out["roofline_floor_ms"] = round(t_min_ms, 3)
    if min_passes < 2.0:
        # The 1.0-pass floor assumes the one-residency kernel; the r3
        # counted A/B measured it slower than the two-pass kernel on
        # this device, so also report the fraction against the floor
        # the winning kernel CAN physically reach (2 HBM passes).
        t2 = 2.0 * 16.0 * batch * n / (bw_gbps * 1e9) * 1e3
        out["roofline_fraction_two_pass"] = round(t2 / out["ms"], 3)
    return out


def _bench_fft_size(jax, jnp, n, batch, bw_gbps, ks, repeats,
                    min_passes=2.0, seed=0, deadline=None,
                    on_update=None) -> dict:
    """SNR-gate + time every candidate path at (batch, n); crown the
    fastest, with the roofline floor at `min_passes` HBM passes.

    `deadline` (absolute time.time()) bounds the sweep: candidates past
    it are recorded as skipped, never started — a cold compile cache can
    cost minutes per candidate over this tunnel and the driver's clock
    does not stop for it. `on_update(interim)` fires after every
    measured candidate so the caller can re-emit the headline line."""
    import time as _time

    rng = np.random.default_rng(seed)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    want = np.fft.fft(np.asarray(xr[0], np.float64)
                      + 1j * np.asarray(xi[0], np.float64))
    results = {}
    # Floor guard uses the healthy band's TOP (400 GB/s), not the
    # pre-flight reading: a candidate measured in a cleaner window than
    # the pre-flight can legitimately beat the pre-flight-derived floor
    # and must not be clamped/flagged (r4 advisor finding). Anything
    # faster than min_passes at 400 GB/s is physically impossible on
    # this chip and stays flagged.
    floor_guard = min_passes * 16.0 * batch * n / (400.0 * 1e9) * 1e3
    for fn, path in _large_fft_candidates(n):
        if (deadline is not None and _time.time() > deadline
                and results):  # always measure at least one candidate
            results[path] = {"error": "skipped: bench time budget spent"}
            continue
        try:
            results[path] = _measure_path(jax, jnp, fn, path, xr, xi,
                                          want, ks=ks, repeats=repeats,
                                          deadline=deadline,
                                          floor_ms=floor_guard)
        except Exception as e:
            results[path] = {"error": str(e)[:140]}
        if on_update is not None and "gsps" in results[path]:
            on_update(_crown(results, min_passes, batch, n, bw_gbps))
    ok = [r for r in results.values() if "gsps" in r]
    clean = [r for r in ok if not r.get("floor_violation")]
    ok = clean or ok
    if not ok:
        return {"error": "no path passed", "paths": results}
    best = max(ok, key=lambda r: r["gsps"])
    out = dict(best)
    out["paths"] = results
    t_min_ms = min_passes * 16.0 * batch * n / (bw_gbps * 1e9) * 1e3
    if out["ms"] < t_min_ms:
        # Faster than the HBM floor is a measurement artifact, not a
        # result (a deflated slope under congestion). Re-measure the
        # winning path once and keep the LARGER (conservative) time;
        # if it still violates the floor, say so rather than publish it.
        fn = dict((p, f) for f, p in _large_fft_candidates(n))[out["path"]]
        try:
            redo = _measure_path(jax, jnp, fn, out["path"], xr, xi, want,
                                 ks=ks, repeats=repeats)
        except Exception:
            redo = {}
        if redo.get("ms", 0.0) > out["ms"]:
            redo["deflated_ms"] = out["ms"]
            out.update({k: redo[k] for k in
                        ("ms", "ms_median", "ms_max", "gsps") if k in redo})
            # keep the per-path table consistent with the headline —
            # consumers read paths[winner] too
            out["paths"] = dict(results, **{out["path"]: redo})
        if out["ms"] < t_min_ms:
            out["floor_violation"] = True
            out["paths"][out["path"]] = dict(
                out["paths"][out["path"]], floor_violation=True)
    out["roofline_fraction"] = round(t_min_ms / out["ms"], 3)
    out["roofline_floor_ms"] = round(t_min_ms, 3)
    if min_passes < 2.0:
        # See _crown: the achievable-floor companion fraction.
        t2 = 2.0 * 16.0 * batch * n / (bw_gbps * 1e9) * 1e3
        out["roofline_fraction_two_pass"] = round(t2 / out["ms"], 3)
    _record_route_wisdom(jax, n, batch, out)
    return out


_PATH_TO_ROUTE = {
    "resident_vmem": "resident_vmem",
    "resident_v4": "resident_v4",
    "resident_v6": "resident_v6",
    "resident_v4_3x": "resident_v4_3x",
    "resident_v6_3x": "resident_v6_3x",
    "resident_cio": "resident_cio",
    "fourstep_vmem": "fourstep_vmem",
    "fourstep_vmem_blocked": "fourstep_vmem",
    "fourstep_vmem_rowmajor": "fourstep_vmem",
    "fourstep_vmem_blocked_w256": "fourstep_vmem",
    "fourstep_vmem_blocked_lanes": "fourstep_vmem",
    "threestep_vmem": "threestep_vmem",
    "threestep_vmem_lanes": "threestep_vmem",
    "threestep_vmem_blocked": "threestep_vmem",
    "einsum_stockham": "einsum",
}


def _record_route_wisdom(jax, n: int, batch: int, out: dict) -> None:
    """Persist the crowned path as dispatch route wisdom: the driver
    runs this bench every round on the real chip, so each bench run
    re-tunes production dispatch (FFT_MEASURE through the front door —
    the loop fft_auto.c:233-235 declares and stubs)."""
    route = _PATH_TO_ROUTE.get(out.get("path", ""))
    if (route is None or out.get("floor_violation")
            or jax.default_backend() != "tpu"):
        return
    try:
        from fftlab.bench.timing import PROTOCOL
        from fftlab.plan import wisdom

        wisdom.import_wisdom()   # merge the existing user file first
        # The committed factory tier must join the comparison too —
        # otherwise a fresh cache lets a congested-window crown shadow
        # the repo-shipped A/B verdict (review r3 finding).
        try:
            wisdom.import_wisdom(wisdom.FACTORY_PATH, overwrite=False)
        except Exception:
            pass
        # MIN-STATISTICS guard: this multi-tenant service swings 2-4x
        # between micro-windows (r3s1 vs r3s2: the 1M crown flipped
        # with no code change), and congestion only ever ADDS time —
        # so a slower-window winner must not overwrite wisdom recorded
        # in a faster window. Only an outright better time re-routes.
        cached = wisdom.lookup(n, "f32", kind="route") or {}
        old_ms = cached.get("time_ms")
        if old_ms is not None and out["ms"] >= float(old_ms):
            return
        wisdom.record(n, "f32", route, out["ms"], kind="route",
                      extra={"protocol": PROTOCOL, "batch": batch,
                             "platform": "tpu", "source": "bench.py",
                             "variant": out.get("path")})
        wisdom.export_wisdom()
    except Exception:
        pass  # wisdom persistence must never fail the bench


def bench_fft_1m(jax, jnp, on_tpu: bool, bw_gbps: float,
                 deadline=None, on_update=None) -> dict:
    """The north-star metric: batched 1M-pt c2c. Floor = ONE HBM
    residency (16 B/sample) when the resident kernel covers the size."""
    n = 1 << 20 if on_tpu else 1 << 12
    batch = 16 if on_tpu else 2
    min_passes = 2.0
    if on_tpu:
        from fftlab.kernels.resident_vmem import supported_resident

        if supported_resident(n):
            min_passes = 1.0
    return _bench_fft_size(jax, jnp, n, batch, bw_gbps,
                           ks=(8, 24, 48), repeats=4,
                           min_passes=min_passes, deadline=deadline,
                           on_update=on_update)


def _large_fft_candidates(n: int):
    """All large-n split paths available on this device (best wins).

    ORDER MATTERS: the sweep emits an updated headline after every
    measured candidate and the driver may kill it at any moment, so the
    presumed winner goes first and experimental variants last — a cold
    compile cache costs minutes per candidate over this tunnel."""
    import jax

    cands = []
    if jax.default_backend() == "tpu":
        try:
            from fftlab.kernels.fourstep_vmem import (
                fft_split_large,
                supported_large,
            )
            from fftlab.kernels.threestep_vmem import (
                fft_split_huge,
                supported_huge,
            )

            from fftlab.kernels.resident_vmem import (
                fft_split_resident,
                supported_resident,
            )

            if supported_large(n):
                # THE PRESUMED WINNER FIRST (factory-crowned: 2.47 ms
                # best-ever at 16x1M): blocked intermediates,
                # contiguous inter-pass DMA. (The w256 wide-lane
                # variant measured slower in BOTH the r2s3 sweep and
                # docs/performance.md's follow-up — it stays in the
                # offline sweep scripts only.)
                cands.append(((lambda a, b, scale=None: fft_split_large(
                    a, b, blocked=True, scale=scale)),
                    "fourstep_vmem_blocked"))
            if supported_resident(n):
                # ONE HBM residency challengers: both passes in VMEM,
                # 16 B/sample. v4 = transposes in phase A; v2 = strided
                # column-chunk edges (v3/cio stays in the offline A/B
                # only — proven slow).
                cands.append(((lambda a, b, scale=None: fft_split_resident(
                    a, b, scale=scale, layout="v4")), "resident_v4"))
                # bf16_3x contractions: half the MXU passes at 103.6-
                # 104.0 dB device SNR (r4 prec probe) — the roofline
                # lever where the kernel is compute-crossed; measured
                # EARLY so a tight row budget still captures it.
                cands.append(((lambda a, b, scale=None: fft_split_resident(
                    a, b, scale=scale, layout="v6", prec="3x")),
                    "resident_v6_3x"))
                # v6 = zero in-VMEM transposes (lane-contraction phase
                # B) — the challenger to v4's crown.
                cands.append(((lambda a, b, scale=None: fft_split_resident(
                    a, b, scale=scale, layout="v6")), "resident_v6"))
                cands.append(((lambda a, b, scale=None: fft_split_resident(
                    a, b, scale=scale, layout="v4", prec="3x")),
                    "resident_v4_3x"))
                # resident v2 stays OUT of the default sweep (lost
                # every r2/r3/r4 comparison); it remains a dispatch
                # route + offline A/B candidate.
            if supported_large(n):
                # row-major stays out too (lost r2s3 + r3; each
                # congested-window candidate costs minutes of the
                # driver's budget). Transpose-free pass 2 (lane
                # contraction) keeps its slot — the r4 paired A/B
                # showed a small consistent lane edge.
                cands.append(((lambda a, b, scale=None: fft_split_large(
                    a, b, blocked=True, scale=scale, lanes=True)),
                    "fourstep_vmem_blocked_lanes"))
            if supported_huge(n):
                cands.append(((lambda a, b, scale=None: fft_split_huge(
                    a, b, scale=scale)), "threestep_vmem"))
                # transpose-free pass 3 (lane-axis FFT): the kernel's
                # only in-VMEM transpose removed — same design move as
                # resident v5/v6.
                cands.append(((lambda a, b, scale=None: fft_split_huge(
                    a, b, scale=scale, lanes=True)),
                    "threestep_vmem_lanes"))
                cands.append(((lambda a, b, scale=None: fft_split_huge(
                    a, b, blocked=True, scale=scale)),
                    "threestep_vmem_blocked"))
            # resident_cio stays OUT of the default sweep: the r3
            # counted A/B measured it 18-98 ms at 16x1M (vs
            # fourstep_blocked's 4.8-6.7) — a cold compile plus a
            # measurement of a proven loser inside the driver's budget
            # buys nothing. It remains an A/B candidate
            # (scripts/tpu_resident_ab.py) and a dispatch route.
        except ImportError:
            pass
    from fftlab.algos.split_stockham import fft_split

    def _einsum(a, b, scale=None):
        yr, yi = fft_split(a, b)
        if scale is None:
            return yr, yi
        import jax.numpy as jnp

        s = jnp.float32(scale)  # XLA fuses this into the last einsum
        return yr * s, yi * s

    # einsum is the universal fallback; on TPU it slots in right after
    # the kernel favourites (fast compile => an early real number even
    # on a cold cache), on CPU it is the only candidate.
    pos = min(2, len(cands))
    cands.insert(pos, (_einsum, "einsum_stockham"))
    return cands




def bench_fft_16m(jax, jnp, on_tpu: bool, bw_gbps: float,
                  deadline=None) -> dict:
    """One SINGLE large transform (the TP-shard shape, one chip);
    the three-pass kernel sets the floor at 3 HBM passes."""
    n = 1 << 24 if on_tpu else 1 << 14
    return _bench_fft_size(jax, jnp, n, 1, bw_gbps,
                           ks=(8, 24, 48), repeats=3, min_passes=3.0,
                           seed=1, deadline=deadline)


def bench_serving_filter(jax, jnp, on_tpu: bool,
                         bw_gbps: float = 285.0, deadline=None) -> dict:
    """Fused overlap-save FIR on a long signal (the serving pipeline).

    Floor: the kernel reads and writes each plane once (16 B/sample of
    the split pair) plus the overlap-save halo re-read
    (fft_size/hop = 16384/(16384-128*ceil(128/128)) ~ 1.07x on the
    read side) — reported as a plain 16 B/sample floor, slightly
    optimistic, so the fraction is conservative."""
    n = 1 << 23 if on_tpu else 1 << 14
    nh = 129
    rng = np.random.default_rng(2)
    h = rng.standard_normal(nh).astype(np.float32) / nh
    xr = jnp.asarray(rng.standard_normal(n), jnp.float32)
    xi = jnp.asarray(rng.standard_normal(n), jnp.float32)

    if on_tpu:
        from fftlab.kernels.os_filter_vmem import pallas_os_filter_split

        # default fft_size: the pipelined aligned kernel (16K blocks,
        # BlockSpec double-buffering) when the taps fit its halo grid
        fn = lambda a, b: pallas_os_filter_split(a, b, h)
        path = "os_filter_vmem"
    else:
        from fftlab.plan.filter_plan import FilterPlan

        plan = FilterPlan(h)
        fn = lambda a, b: plan._jit_blocks(
            jnp.pad(a, (nh - 1, 0)), jnp.pad(b, (nh - 1, 0)))
        path = "xla_blocks"

    yr, yi = jax.jit(fn)(xr, xi)
    # Prefix gate slice: linear-convolution prefixes are position-exact
    # (y[:m] depends only on x[:m]), and m = 128K spans eight 16K
    # overlap-save block boundaries — while the full readback (32 MB x
    # 2 planes) over a congested tunnel would burn the row budget.
    m = min(n, 1 << 17)
    xr_h = np.asarray(xr[:m], np.float64)
    xi_h = np.asarray(xi[:m], np.float64)
    want_r = np.convolve(xr_h, h.astype(np.float64))[:m]
    want_i = np.convolve(xi_h, h.astype(np.float64))[:m]
    snr = min(_snr_db(np.asarray(yr[:m], np.float64), want_r),
              _snr_db(np.asarray(yi[:m], np.float64), want_i))
    if snr < 100.0:
        return {"error": f"accuracy gate failed: {snr:.1f} dB < 100",
                "snr_db": round(snr, 1), "path": path}

    def step(a, b):
        zr, zi = fn(a, b)
        return zr, zi

    def mk(i):
        t = jnp.float32(1e-3 * i)
        return (xr + t, xi - t)

    t_min_ms = 16.0 * n / (bw_gbps * 1e9) * 1e3
    r = _spread(step, mk, ks=(8, 24, 48), repeats=3, deadline=deadline,
                floor_ms=t_min_ms * bw_gbps / 400.0 if on_tpu else None)
    r["gsps"] = round(2 * n / (r["ms"] / 1e3) / 1e9, 4)  # 2 real channels
    r["snr_db"] = round(snr, 1)
    r["path"] = path
    if on_tpu:
        r["roofline_fraction"] = round(min(t_min_ms / r["ms"], 1.0), 3)
        r["roofline_floor_ms"] = round(t_min_ms, 3)
    return r


def bench_spectral_filter_1m(jax, jnp, on_tpu: bool, bw_gbps: float,
                             deadline=None) -> dict:
    """The FFT -> H -> IFFT sandwich at 1M (fft_filtering.c:111-132 hot
    path): two-launch blocked sandwich (4 HBM passes) vs the fused
    single-residency kernel (1 residency + streamed H = 24 B/sample).
    Floor = the fused kernel's 24 B/sample."""
    n = 1 << 20 if on_tpu else 1 << 12
    batch = 16 if on_tpu else 2
    rng = np.random.default_rng(4)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    # E[|H|^2] = 1 keeps chained magnitudes stationary (Parseval)
    H = rng.standard_normal(n).astype(np.float32)
    hr = jnp.asarray(H)
    hi = jnp.zeros(n, jnp.float32)
    want = np.fft.ifft(np.fft.fft(
        np.asarray(xr[0], np.float64) + 1j * np.asarray(xi[0], np.float64)
    ) * H.astype(np.float64))

    cands = []
    if on_tpu:
        from fftlab.kernels.fourstep_vmem import (
            spectral_filter_large,
            supported_large,
        )
        from fftlab.kernels.resident_vmem import (
            spectral_filter_resident,
            spectral_filter_resident_cio,
            supported_resident,
        )

        # Winner-first ordering (same rationale as _large_fft_candidates):
        # the r3 counted A/B crowned the blocked two-launch sandwich on
        # medians; the resident variants follow as challengers.
        if supported_large(n):
            # lanes=True is the production default since the r4
            # two-campaign flip — it leads; the no-lanes incumbent
            # stays as the explicit comparison point.
            cands.append((lambda a, b, scale=None: spectral_filter_large(
                a, b, hr, hi, blocked=True, lanes=True),
                "fourstep_filter_lanes"))
            cands.append((lambda a, b, scale=None: spectral_filter_large(
                a, b, hr, hi, blocked=True, lanes=False),
                "fourstep_filter_blocked"))
        if supported_resident(n):
            from fftlab.kernels.resident_vmem import (
                spectral_filter_resident_v5,
            )

            from fftlab.kernels.resident_vmem import (
                spectral_filter_resident_v7,
            )

            # v7 = v4 TRANSPOSE PLACEMENT applied to the sandwich:
            # corner turns ride the DMA-overlapped phases, the mid
            # step is pure FFT·H·IFFT (the VERDICT r4 "obvious next
            # candidate").
            cands.append((lambda a, b, scale=None:
                          spectral_filter_resident_v7(a, b, hr, hi),
                          "resident_filter_v7"))
            # v5 = transpose-free lane-contraction sandwich: the same
            # design move that made resident_v4 the 1M FFT champion,
            # applied to BOTH corner turns of the fused filter.
            cands.append((lambda a, b, scale=None:
                          spectral_filter_resident_v5(a, b, hr, hi),
                          "resident_filter_v5"))
            # v5 with bf16_3x contractions: the sandwich pays 4 column
            # FFTs per residency, so the pass count bites twice as hard
            # as in the plain kernel (interpret SNR 102.8 dB).
            cands.append((lambda a, b, scale=None:
                          spectral_filter_resident_v5(a, b, hr, hi,
                                                      prec="3x"),
                          "resident_filter_v5_3x"))
            cands.append((lambda a, b, scale=None: spectral_filter_resident(
                a, b, hr, hi), "resident_filter"))
            cands.append((lambda a, b, scale=None:
                          spectral_filter_resident_cio(a, b, hr, hi),
                          "resident_filter_cio"))
    if not cands:
        from fftlab.algos.split_stockham import spectral_filter_split

        cands.append((lambda a, b, scale=None: spectral_filter_split(
            a, b, hr, hi), "einsum_filter"))

    import time as _time

    results = {}
    t_min_ms = 24.0 * batch * n / (bw_gbps * 1e9) * 1e3
    for fn, path in cands:
        if deadline is not None and _time.time() > deadline and results:
            results[path] = {"error": "skipped: bench time budget spent"}
            continue
        try:
            results[path] = _measure_path(
                jax, jnp, fn, path, xr, xi, want, ks=(3, 8, 14),
                repeats=3, deadline=deadline,
                floor_ms=t_min_ms * bw_gbps / 400.0 if on_tpu else None)
        except Exception as e:
            results[path] = {"error": str(e)[:140]}
    ok = [r for r in results.values() if "gsps" in r]
    clean = [r for r in ok if not r.get("floor_violation")]
    ok = clean or ok
    if not ok:
        return {"error": "no path passed", "paths": results}
    best = max(ok, key=lambda r: r["gsps"])
    out = dict(best)
    out["paths"] = results
    out["roofline_fraction"] = round(t_min_ms / out["ms"], 3)
    out["roofline_floor_ms"] = round(t_min_ms, 3)
    return out


def bench_bluestein_prime(jax, jnp, on_tpu: bool, bw_gbps: float,
                          deadline=None) -> dict:
    """Arbitrary-size (prime) transform via chirp-z (BASELINE config 3;
    reference bluestein.c:79-148). The internal circular convolution is
    the FFT->B->IFFT sandwich at m = next_pow2(2n-1), routed through the
    fused VMEM kernels on TPU — the floor reported here is the
    sandwich's 4 HBM passes at m (modulate/demodulate excluded, so the
    fraction is conservative)."""
    from fftlab.algos.bluestein import bluestein_fft_split
    from fftlab.core.types import next_power_of_two

    # n=500009 -> m=2^20: the size device-proven at 131.8 dB (r2s6).
    # n=1000003 would need the m=2^21 sandwich, which CRASHES the
    # backend compiler (HTTP 500, r3s2) — the L=2048 pass slabs sit at
    # the documented 12-slab VMEM compile ceiling and the sandwich's H
    # operands push past it.
    n = 500009 if on_tpu else 10007  # prime
    batch = 4 if on_tpu else 1
    m = next_power_of_two(2 * n - 1)
    rng = np.random.default_rng(6)
    xr = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    want = np.fft.fft(np.asarray(xr[0], np.float64)
                      + 1j * np.asarray(xi[0], np.float64))

    import os as _os
    import time as _time

    def mk_fn(variant):
        # The env is read at TRACE time inside spectral_filter_auto, so
        # setting it around the closure's first call pins the variant
        # for that jitted candidate.
        def fn(a, b, scale=None, _v=variant):
            prev = _os.environ.get("FFTLAB_RESIDENT_FILTER")
            _os.environ["FFTLAB_RESIDENT_FILTER"] = _v
            try:
                yr, yi = bluestein_fft_split(a, b)
            finally:
                if prev is None:
                    _os.environ.pop("FFTLAB_RESIDENT_FILTER", None)
                else:
                    _os.environ["FFTLAB_RESIDENT_FILTER"] = prev
            if scale is None:
                return yr, yi
            s = jnp.float32(scale)  # fuses into the demodulate multiply
            return yr * s, yi * s

        return fn

    # Sandwich-variant sweep: default (blocked two-launch, 4 passes at
    # m) vs the one-residency v7 chirp sandwich (1 residency + streamed
    # B = the fused-filter floor). VERDICT r4 item 6: the chirp
    # convolution IS spectral_filter_auto's domain — measure it on the
    # fused path explicitly.
    cands = [("bluestein_split", mk_fn("0"), 4.0)]
    if on_tpu:
        cands.insert(0, ("bluestein_split_v7", mk_fn("v7"), 1.5))

    results = {}
    best = None
    for path, fn, passes in cands:
        if deadline is not None and _time.time() > deadline and results:
            results[path] = {"error": "skipped: bench time budget spent"}
            continue
        t_floor = passes * 16.0 * batch * m / (bw_gbps * 1e9) * 1e3
        r = _measure_path(jax, jnp, fn, path, xr, xi, want,
                          ks=(3, 8, 14), repeats=3, deadline=deadline,
                          floor_ms=t_floor * bw_gbps / 400.0
                          if on_tpu else None)
        if "ms" in r:
            r["roofline_fraction"] = round(t_floor / r["ms"], 3)
            r["roofline_floor_ms"] = round(t_floor, 3)
        results[path] = r
        if "ms" in r and (best is None or r["ms"] < best["ms"]):
            best = r
    if best is None:
        first = next(iter(results.values()))
        first["paths"] = results
        first.setdefault("n", n)
        return first
    out = dict(best)
    out["paths"] = results
    out["n"] = n
    out["m_internal"] = m
    return out


def bench_rfft(jax, jnp, on_tpu: bool, bw_gbps: float,
               deadline=None) -> dict:
    """Real-input transform through the device-native r2c plan
    (plan_r2c_1d_split): the pack-two-reals trick runs a HALF-size
    complex transform through the dispatch route (the resident kernels
    at this size), then Hermitian-unpacks in XLA. The reference's r2c
    plan path never worked (fft_auto.c:391-403 use-after-free); this is
    it, measured. Floor = the half-size transform's one residency
    (8 B per real sample) + the unpack's read+write (~8 B) ≈
    16 B/sample — the gap above that is the unfused XLA unpack, the
    next fusion target."""
    import os as _os
    import time as _time

    from fftlab.plan.api import plan_r2c_1d_split

    n = 1 << 21 if on_tpu else 1 << 12
    batch = 8 if on_tpu else 2
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
    want = None  # lazily computed once (np.fft.rfft at 2M is ~0.1 s)

    # Candidate sweep, fused-first (the expected winner): the fused
    # one-residency kernel vs the three-program split pipeline the
    # plan layer routed before r5.
    cands = []
    from fftlab.kernels.rfft_resident import supported_rfft_resident

    if on_tpu and supported_rfft_resident(n):
        from fftlab.kernels.rfft_resident import rfft_resident

        cands.append(("rfft_resident", lambda a: rfft_resident(a)))
    _os.environ["FFTLAB_RFFT_FUSED"] = "0"  # pipeline plan for contrast
    try:
        plan = plan_r2c_1d_split(n)
    finally:
        del _os.environ["FFTLAB_RFFT_FUSED"]
    cands.append((plan.algorithm, plan.fn))

    total = batch * n
    # Floor: one residency — read n reals (4 B) + write ~n/2+1 complex
    # split bins (8 B) ≈ 12 B/sample.
    t_min_ms = 12.0 * total / (bw_gbps * 1e9) * 1e3
    results = {}
    for path, fn in cands:
        if deadline is not None and _time.time() > deadline and results:
            results[path] = {"error": "skipped: bench time budget spent"}
            continue
        try:
            gr, gi = jax.jit(fn)(x[:1])
            # 64K-bin gate slice (congested-tunnel readback, see
            # _measure_path)
            m = min(n // 2 + 1, 1 << 16)
            got = (np.asarray(gr[0, :m], np.float64)
                   + 1j * np.asarray(gi[0, :m], np.float64))
            if want is None:
                want = np.fft.rfft(np.asarray(x[0], np.float64))[:m]
            snr = _snr_db(got, want)
            if snr < 100.0:
                results[path] = {
                    "error": f"accuracy gate failed: {snr:.1f} dB < 100",
                    "snr_db": round(snr, 1), "path": path}
                continue
            # Pallas-kernel routes are opaque to XLA (no slice
            # propagation can prune them) -> scalar carry; the XLA
            # einsum fallback is prunable and needs the full-sum carry.
            kernel_route = any(k in path for k in
                               ("resident", "fourstep", "threestep",
                                "pallas"))

            def step(a, _fn=fn, _kr=kernel_route):
                yr, yi = _fn(a)
                if _kr:
                    return (a + jnp.float32(1e-30) * (yr[0, 0] + yi[0, 0]),)
                return (a + jnp.float32(1e-30)
                        * (jnp.sum(yr) + jnp.sum(yi)),)

            r = _spread(step, lambda i: (x + jnp.float32(1e-3 * i),),
                        ks=(6, 16, 32), repeats=3, deadline=deadline,
                        floor_ms=t_min_ms * bw_gbps / 400.0
                        if on_tpu else None)
            r["gsps"] = round(total / (r["ms"] / 1e3) / 1e9, 4)
            r["snr_db"] = round(snr, 1)
            r["path"] = path
            results[path] = r
        except Exception as e:
            results[path] = {"error": str(e)[:140], "path": path}
    ok = [r for r in results.values() if "ms" in r]
    if not ok:
        first = next(iter(results.values()))
        first.setdefault("n", n)
        first["paths"] = results
        return first
    best = min(ok, key=lambda r: r["ms"])
    out = dict(best)
    out["paths"] = results
    out["roofline_fraction"] = round(t_min_ms / best["ms"], 3)
    out["roofline_floor_ms"] = round(t_min_ms, 3)
    out["n"] = n
    return out


def bench_stft(jax, jnp, on_tpu: bool, deadline=None) -> dict:
    """Pallas streaming STFT vs the XLA gather-framing STFT."""
    n = 1 << 22 if on_tpu else 1 << 14
    frame, hop = 2048, 512
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)

    from fftlab.algos.split_stockham import stockham_fft_split_unscaled
    from fftlab.core.framing import frame_signal_strided, frames_needed
    from fftlab.core.types import Direction
    from fftlab.core.window import get_window

    n_frames = frames_needed(n, frame, hop)
    w = jnp.asarray(get_window("hann", frame), jnp.float32)

    def xla_step(sig):
        fr = frame_signal_strided(sig, frame, hop, n_frames) * w
        Xr, Xi = stockham_fft_split_unscaled(
            fr, jnp.zeros_like(fr), Direction.FORWARD
        )
        # Carry a FULL reduction: keeping only Xr[0, 0] live would let
        # XLA slice-propagate through the batched frame dim and prune
        # most of the STFT (the opaque pallas_call below cannot be
        # pruned, so the comparison must keep both sides whole).
        return (sig + jnp.float32(1e-30) * jnp.sum(Xr),)

    out = {}
    # The Pallas kernel is the HEADLINE and runs first — if the row
    # deadline hits mid-yardstick the important number already landed
    # (r3s2's watchdog fired inside the slow XLA measurement).
    if on_tpu:
        try:
            from fftlab.kernels.stft_vmem import pallas_stft_split

            def k_step(sig):
                fr, fi = pallas_stft_split(sig, frame, hop)
                # same full-reduction carry as xla_step (symmetry)
                return (sig + jnp.float32(1e-30) * jnp.sum(fr),)

            r = _spread(k_step, lambda i: (x + jnp.float32(i),),
                        ks=(8, 24, 48), repeats=3, deadline=deadline)
            n_frames = (n - frame) // hop + 1
            r["gsps"] = round(n_frames * frame / (r["ms"] / 1e3) / 1e9, 4)
            out["pallas"] = r
        except Exception as e:  # pragma: no cover
            out["pallas"] = {"error": str(e)[:120]}
    try:
        # Short chains for the slow baseline: the gather path runs
        # ~124 ms/application on TPU, so k=48 chains cost ~6 s per
        # sample and starved the metrics behind it (r3s2's watchdog
        # fired during this measurement). The Pallas side keeps long
        # chains; only the yardstick is shortened.
        r = _spread(xla_step, lambda i: (x + jnp.float32(i),),
                    ks=(2, 5, 8), repeats=3, deadline=deadline)
        n_frames = (n - frame) // hop + 1
        r["gsps"] = round(n_frames * frame / (r["ms"] / 1e3) / 1e9, 4)
        out["xla"] = r
    except Exception as e:  # pragma: no cover
        out["xla"] = {"error": str(e)[:120]}
    if "ms" in out.get("pallas", {}) and "ms" in out.get("xla", {}):
        out["pallas_speedup_vs_xla"] = round(
            out["xla"]["ms"] / out["pallas"]["ms"], 2)
    return out


def _service_alive(timeout_s: float = 180.0) -> bool:
    """Ping the device from a FRESH subprocess with a hard timeout.

    The tunneled service has outage windows where any device op blocks
    forever and the calling process can never recover (the runtime
    wedges on the dead RPC) — probing in-process would take the whole
    bench down with it."""
    import subprocess

    ping = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((8, 1024), jnp.float32); "
            "(x + 1.0).block_until_ready(); print('up')")
    try:
        r = subprocess.run([sys.executable, "-c", ping],
                           timeout=timeout_s, capture_output=True,
                           text=True)
        return r.returncode == 0 and "up" in r.stdout
    except Exception:
        return False


def _last_healthy_note() -> dict:
    """Context for an outage artifact: the most recent bench capture
    with a nonzero headline, CLEARLY labeled as historical — the 0.0
    headline stands; this only tells the reader what the device did the
    last time it was reachable."""
    import glob
    import os

    best = None
    for p in sorted(glob.glob("bench_artifacts/bench_*.json"),
                    key=os.path.getmtime, reverse=True):
        try:
            with open(p) as f:
                blob = json.load(f)
        except Exception:
            continue
        if blob.get("value"):
            best = {"last_healthy_capture": {
                "file": p, "value": blob["value"],
                "unit": blob.get("unit"),
                "mtime": os.path.getmtime(p)}}
            break
    return best or {}


_BASELINE_GSPS = (1 << 20) / 4.5e-3 / 1e9  # RTX 3090 cuFFT anchor


_ARTIFACT_PATH = "bench_artifacts/bench_latest.json"


def _dump_artifact(line: dict, detail: dict) -> None:
    """Full nested detail goes to a file, atomically (tmp+rename), so
    an external kill mid-write can never corrupt the artifact and the
    driver's stdout line never has to carry it."""
    import os
    import tempfile

    try:
        os.makedirs("bench_artifacts", exist_ok=True)
        blob = dict(line)
        blob["detail"] = detail
        fd, tmp = tempfile.mkstemp(dir="bench_artifacts", suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(blob, f, indent=1)
        os.replace(tmp, _ARTIFACT_PATH)
    except Exception:
        pass  # the stdout line is the contract; the artifact is bonus


def _compact(detail: dict) -> dict:
    """Per-row summary small enough for the driver's bounded stdout
    tail (r04 lesson: the capture keeps the LAST 2000 CHARS — the full
    nested detail blew past it twice in four rounds, scoring the round
    `parsed: null`). Keep only the fields a judge needs at a glance;
    everything else lives in the artifact file."""
    out = {}
    for k, v in detail.items():
        if not isinstance(v, dict):
            out[k] = v
            continue
        row = {}
        for f in ("ms", "gsps", "gbps", "snr_db", "path", "healthy"):
            if f in v:
                val = v[f]
                row[f] = round(val, 3) if isinstance(val, float) else val
        if "roofline_fraction" in v:
            row["rf"] = round(v["roofline_fraction"], 3)
        if "error" in v:
            row["error"] = str(v["error"])[:48]
        out[k] = row
    return out


def _headline(detail: dict, partial: bool) -> str:
    """The driver-facing JSON line, built from whatever `detail` holds
    RIGHT NOW. Printed incrementally — after the bandwidth pre-flight,
    after every 1M candidate, and after every sub-bench — because the
    driver captures stdout even when it kills the process (r02 proved
    it: rc=124 with the warning banner intact) and keeps the last
    2000 chars. Every emit must therefore be a valid COMPACT artifact
    (<~1.2 KB); the full detail rides in bench_artifacts/."""
    head = detail.get("fft_1m_batched", {}) or {}
    gsps = head.get("gsps", 0.0) or 0.0
    line = {
        "metric": "fft_1m_batched_throughput",
        "value": gsps,
        "unit": "Gsamples/s",
        "vs_baseline": round(gsps / _BASELINE_GSPS, 3) if gsps else 0.0,
        "artifact": _ARTIFACT_PATH,
        "summary": _compact(detail),
    }
    if partial:
        line["partial"] = True
    _dump_artifact(line, detail)
    s = json.dumps(line, separators=(",", ":"))
    if len(s) > 1900:  # belt-and-braces: never exceed the capture
        line.pop("summary", None)
        s = json.dumps(line, separators=(",", ":"))
    return s


def _arm_watchdog(fuse_s: float, detail: dict) -> None:
    """Guarantee the driver its final JSON line even if a device op
    wedges mid-bench: after `fuse_s`, print whatever detail has
    accumulated, flagged, and hard-exit (a wedged XLA call cannot be
    interrupted any other way)."""
    import threading

    def fire():
        detail["watchdog"] = f"fired after {fuse_s:.0f}s (device wedged?)"
        print(_headline(detail, partial=False), flush=True)
        import os as _os

        _os._exit(0)

    t = threading.Timer(fuse_s, fire)
    t.daemon = True
    t.start()


def main() -> None:
    import os
    import time as _time

    # Persistent compile cache shared with scripts/tpu_session.py etc.:
    # kernel compiles over this tunnel cost 20-120 s each, and the
    # candidate set is ~8 pallas variants — warm cache turns the bench
    # from ~15 min of compiling into seconds.
    cache_dir = os.path.expanduser("~/.cache/jax_comp")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    if os.environ.get("FFTLAB_BENCH_CPU") == "1":
        # JAX_PLATFORMS=cpu does NOT override this environment's
        # preregistered tunnel backend; only the config call does.
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    t_start = _time.time()
    # Driver-safe self-budget (r02 lesson: the driver killed a bench
    # whose own watchdog was armed at ~85 min — rc=124, no metric;
    # r03 lesson: its own 1020 s watchdog fired mid-1M-sweep and the
    # driver captured the flagged partial fine, so ~17 min total is
    # survivable). Defaults target ~16 min worst-case wall clock:
    # wait <=240 s for an outage/congestion, then <=12 min of
    # measurement split into PER-ROW budgets (cheap rows first) so one
    # noisy sweep can never starve the rows behind it. Sessions that
    # want the full patient sweep raise FFTLAB_BENCH_*.
    # wait default 420 s: the r4 device showed hour-scale congestion
    # with minute-scale clean windows — waiting longer beats measuring
    # garbage, and the incremental emission means even an external
    # kill mid-wait still leaves valid JSON on stdout.
    budget_s = float(os.environ.get("FFTLAB_BENCH_BUDGET_S", "720"))
    wait_s_early = float(os.environ.get("FFTLAB_BENCH_WAIT_S", "420"))
    detail: dict = {}

    def emit(partial=True):
        print(_headline(detail, partial), flush=True)

    # Outage guard BEFORE the first in-process device touch: if the
    # service is down, wait for it in bounded subprocess pings; if it
    # never returns, emit the JSON line and exit instead of wedging.
    skip_ping = (os.environ.get("JAX_PLATFORMS", "").lower() == "cpu"
                 or os.environ.get("FFTLAB_BENCH_CPU") == "1"
                 or os.environ.get("FFTLAB_BENCH_SKIP_PING") == "1")
    if not skip_ping:
        while not _service_alive(timeout_s=min(180.0, wait_s_early)):
            detail["service"] = "outage: ping timed out"
            if _time.time() - t_start > wait_s_early:
                detail.update(error="TPU service unreachable for the "
                              "whole pre-flight window",
                              **_last_healthy_note())
                emit(partial=False)
                return
            _time.sleep(30)
    # A wedge can also strike mid-bench; the watchdog guarantees a
    # final line (intermediate lines have already been flushed anyway).
    _arm_watchdog(wait_s_early + budget_s + 300.0, detail)

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    detail["platform"] = platform
    emit()  # capturable line BEFORE any device op (r04 smoke lesson:
    # a congested window can stall even the bandwidth pre-flight past
    # an external kill — the driver must still find valid JSON)

    # Pre-flight: the tunneled service has congestion windows where any
    # timing is garbage, and artifact windows where deflated slopes read
    # as implausibly HIGH bandwidth (observed 700-4000 GB/s) — a single
    # in-band reading is not proof of health. Require TWO consecutive
    # readings inside the known-healthy band (150-400 GB/s on this
    # service), same gate as fftlab.bench.timing.wait_healthy, bounded
    # by FFTLAB_BENCH_WAIT_S so the driver always gets its JSON line.
    # The gate itself uses CHEAP probes (quick_bandwidth, ~16 MB
    # chains): under heavy congestion the full-size bandwidth chains
    # themselves run for minutes (observed: >580 s without completing
    # one attempt), so the expensive artifact-grade measurement runs
    # ONCE, only after the cheap gate opens.
    from fftlab.bench.timing import quick_bandwidth

    wait_s = wait_s_early  # one source of truth for the pre-flight window
    in_band = lambda g: 150.0 < g < 400.0
    bw = {}
    confirmed = 0
    last_quick = -1.0
    while on_tpu:
        try:
            last_quick = round(quick_bandwidth(), 1)
        except Exception:
            last_quick = -1.0
        confirmed = confirmed + 1 if in_band(last_quick) else 0
        detail["bandwidth"] = {"quick_gbps": last_quick,
                               "healthy": False,
                               "waited_s": round(_time.time() - t_start, 1)}
        emit()
        if confirmed >= 2 or _time.time() - t_start > wait_s:
            break
        _time.sleep(5 if confirmed else 20)
    healthy = (not on_tpu) or confirmed >= 2
    if healthy:
        try:
            bw = bench_bandwidth(jnp, on_tpu)
        except Exception as e:
            bw = {"error": str(e)[:160]}
        g = bw.get("gbps") or 0.0
        healthy = (not on_tpu) or in_band(g)
    bw["quick_gbps"] = last_quick
    bw["waited_s"] = round(_time.time() - t_start, 1)
    bw["healthy"] = bool(healthy)
    detail["bandwidth"] = bw
    bw_gbps = bw.get("gbps") or 285.0
    if on_tpu and not in_band(bw_gbps):
        # Unhealthy-window reading: using it for roofline floors would
        # either inflate every floor (congested, low reading) or deflate
        # them (tunnel artifact, high reading). Fall back to the known
        # steady-state effective bandwidth and say so.
        bw["floor_gbps_used"] = 285.0
        bw_gbps = 285.0
    emit()  # first capturable line: platform + bandwidth, value 0.0
    # The measurement budget starts AFTER the pre-flight wait — waiting
    # out an unhealthy window must not eat the sub-benches' time (the
    # wait can legitimately consume up to wait_s on a congested service).
    t_meas0 = _time.time()
    deadline = t_meas0 + budget_s

    def on_1m_update(interim):
        # Re-emit the headline as soon as ANY 1M candidate lands — the
        # single most important number must survive an external kill.
        detail["fft_1m_batched"] = interim
        emit()

    # ROW ORDER (r3 review): cheap rows FIRST — serving filter, STFT,
    # Bluestein, rfft all cost <=5 ms/measurement and land in seconds
    # on a warm cache — then the 1M candidate sweep, then 16M. Each
    # row gets its own hard budget slice (skip-and-continue), so even
    # a congested 1M sweep cannot erase the rows that already landed
    # and the suite ALWAYS completes its table the way the reference's
    # does (benchmark_all.c:274-279). The 16M row keeps a reserved
    # slice that the 1M sweep cannot eat.
    def _health_stamp(row_name: str, expensive: bool) -> float:
        """Cheap bandwidth reading stamped on the row about to run; for
        expensive rows an out-of-band reading buys one short wait."""
        from fftlab.bench.timing import quick_bandwidth

        try:
            g = quick_bandwidth()
        except Exception:
            g = -1.0
        if expensive and not in_band(g) and _time.time() < deadline - 120:
            _time.sleep(20)
            try:
                g = quick_bandwidth()
            except Exception:
                g = -1.0
        return round(g, 1)

    reserve_16m = 110.0  # seconds the 1M sweep must leave on the table
    rows = (
        ("serving_filter", 80.0, False,
         lambda dl: bench_serving_filter(jax, jnp, on_tpu, bw_gbps,
                                         deadline=dl)),
        ("stft", 110.0, False, lambda dl: bench_stft(jax, jnp, on_tpu,
                                                     deadline=dl)),
        ("bluestein_prime", 80.0, False,
         lambda dl: bench_bluestein_prime(jax, jnp, on_tpu, bw_gbps,
                                          deadline=dl)),
        ("rfft_2m", 90.0, False, lambda dl: bench_rfft(jax, jnp, on_tpu,
                                                       bw_gbps,
                                                       deadline=dl)),
        ("spectral_filter_1m", 140.0, True,
         lambda dl: bench_spectral_filter_1m(jax, jnp, on_tpu, bw_gbps,
                                             deadline=dl)),
        ("fft_1m_batched", None, True,
         lambda dl: bench_fft_1m(jax, jnp, on_tpu, bw_gbps, deadline=dl,
                                 on_update=on_1m_update)),
        ("fft_16m_single", None, True,
         lambda dl: bench_fft_16m(jax, jnp, on_tpu, bw_gbps,
                                  deadline=dl)),
    )
    for name, slice_s, expensive, f in rows:
        now = _time.time()
        if now > deadline - 10:
            detail[name] = {"error": "skipped: bench time budget spent"}
            emit()
            continue
        if name == "fft_1m_batched":
            row_deadline = deadline - reserve_16m
        elif slice_s is None:  # 16M: everything that is left
            row_deadline = deadline
        else:
            row_deadline = min(now + slice_s, deadline)
        hg = _health_stamp(name, expensive) if on_tpu else -1.0
        try:
            detail[name] = f(row_deadline)
        except Exception as e:
            detail[name] = {"error": str(e)[:160]}
        if on_tpu:
            detail[name]["health_gbps"] = hg
        detail[name]["row_s"] = round(_time.time() - now, 1)
        emit()  # each completed sub-bench enriches the capturable line
    detail["wall_s"] = round(_time.time() - t_start, 1)
    emit(partial=False)


if __name__ == "__main__":
    sys.exit(main())
