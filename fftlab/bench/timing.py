"""Backend-hardened device timing: the slope/readback protocol.

This environment's TPU service (a) memoizes repeated identical
computations — re-running f(x) on the same x can return early, and
(b) `block_until_ready` can return before the device work is drained;
only a literal READBACK of output bytes is a reliable fence. Plus every
host<->device sync costs a ~28 ms round trip. A naive
warm-up + loop + block timing (the reference's harness shape,
benchmark_all.c:119-131) therefore measures nothing on this backend.

`slope_time` fixes all three at once:
  1. inputs VARY per iteration (defeats memoization),
  2. completion is forced by a one-element numpy readback,
  3. per-iteration cost is the SLOPE between a short and a long run,
     cancelling the fixed dispatch + readback round trip.

Every timing consumer (bench.py, plan/planner.py FFT_MEASURE,
plan/split_tuning.py) shares this implementation; wisdom entries it
produces carry ``protocol: "slope"``.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Sequence

import numpy as np

PROTOCOL = "slope"


def _first_leaf(out: Any):
    while isinstance(out, (tuple, list)):
        out = out[0]
    return out


def slope_time(fn: Callable, make_args: Callable[[int], Sequence],
               iters: int = 6, repeats: int = 3) -> float:
    """Median per-call seconds of ``fn(*make_args(i))`` under the
    hardened protocol.

    make_args(i) must return a DIFFERENT argument tuple for EVERY
    distinct i — i grows without bound across runs and repeats, so a
    caller that cycles a fixed pool (``pool[i % k]``) re-feeds
    already-computed inputs and the backend's memoization fakes the
    timing (vary the data, not the shapes — shape changes recompile).
    """
    import jax

    iters = max(int(iters), 2)
    ctr = [0]

    def fresh(k: int) -> list:
        out = []
        for _ in range(k):
            out.append(tuple(make_args(ctr[0])))
            ctr[0] += 1
        return out

    # compile + warm + fence
    _ = np.asarray(_first_leaf(fn(*fresh(1)[0]))).ravel()[:1]

    def run(k: int) -> float:
        variants = fresh(k)  # NEVER reused: each run times fresh inputs
        jax.block_until_ready(variants)
        t0 = time.perf_counter()
        outs = [fn(*v) for v in variants]
        _ = np.asarray(_first_leaf(outs[-1])).ravel()[:1]
        return time.perf_counter() - t0

    k1, k2 = max(iters // 3, 1), iters
    slopes = [(run(k2) - run(k1)) / (k2 - k1) for _ in range(repeats)]
    return float(np.median(slopes))



def chain_time(step: Callable, mk_state: Callable[[int], Sequence],
               ks: Sequence[int] = (8, 128), repeats: int = 5,
               return_all: bool = False, return_raw: bool = False):
    """Per-application seconds of a shape-preserving `step` measured by
    chaining k applications inside ONE jitted fori_loop.

    Sturdier than `slope_time` when per-dispatch jitter is large (this
    environment's tunnel can add hundreds of ms of variance per call):
    an entire k-iteration sweep costs exactly one dispatch + one
    readback, and the k_small/k_big slope cancels that fixed cost with
    (k_big - k_small) iterations of amplified signal. The chain is
    data-dependent (each iteration consumes the previous output), so
    XLA cannot collapse it, and each repeat uses fresh inputs so the
    backend's computation memoization never hits.

    step: tuple-of-arrays -> same-shaped tuple. mk_state(r): fresh
    input tuple per repeat.
    """
    import jax
    from jax import lax

    ks = sorted(int(k) for k in ks)

    def chained(state, _k):
        return lax.fori_loop(0, _k, lambda i, s: tuple(step(*s)), state)

    import functools as _ft

    fns = {k: jax.jit(_ft.partial(chained, _k=k)) for k in ks}
    s0 = tuple(mk_state(0))
    for k in ks:
        _ = np.asarray(_first_leaf(fns[k](s0))).ravel()[:1]  # compile+warm
    slopes = []
    raw: dict = {}
    for r in range(repeats):
        ts = {}
        for k in ks:
            s = tuple(mk_state(1 + r * 7919 + k))
            jax.block_until_ready(s)
            t0 = time.perf_counter()
            out = fns[k](s)
            _ = np.asarray(_first_leaf(out)).ravel()[:1]
            ts[k] = time.perf_counter() - t0
        slopes.append((ts[ks[-1]] - ts[ks[0]]) / (ks[-1] - ks[0]))
        for k in ks:
            raw.setdefault(k, []).append(ts[k])
    if return_raw:
        return {int(k): [float(t) for t in v] for k, v in raw.items()}
    if return_all:
        return [float(s) for s in slopes]
    return float(np.median(slopes))


def copy_bandwidth(nbytes: int = 1 << 27) -> float:
    """Effective HBM copy-chain bandwidth in GB/s (health probe).

    Chains an elementwise +1 over two float32 arrays totalling
    ``nbytes`` (read+write each => 4x traffic per step) and converts the
    min-slope per-step time to GB/s. Known-healthy band on this service:
    150-400 GB/s; readings far above are tunnel slope artifacts, far
    below are congestion. Returns -1.0 on a non-positive slope.
    """
    import jax.numpy as jnp

    n = max(nbytes // 8, 1 << 16)  # two f32 arrays of n elements
    shape = (16, n // 16)
    x = jnp.ones(shape, jnp.float32)
    y = jnp.ones(shape, jnp.float32)
    ctr = [0]

    def mk(_i):
        ctr[0] += 1
        t = jnp.float32(ctr[0] * 1e-3)
        return (x + t, y - t)

    raw = chain_time(lambda a, b: (a + 1.0, b + 1.0), mk, ks=(4, 64),
                     repeats=3, return_raw=True)
    dt = min_slope(raw)
    return (4.0 * 4 * shape[0] * shape[1] / dt / 1e9) if dt > 0 else -1.0


def wait_healthy(lo: float = 150.0, hi: float = 400.0,
                 deadline_s: float = 3600.0, sleep_s: float = 120.0,
                 log: Callable[[dict], None] | None = None) -> bool:
    """Block until TWO consecutive copy-bandwidth readings land inside
    (lo, hi) GB/s, or the deadline passes. Returns True on healthy.

    The double reading rejects the tunnel's two failure modes at once:
    sustained congestion (readings below lo) and deflated-slope
    artifacts (implausible readings above hi that a single sample can
    produce). Shared by every device probe so 'health-gated' means the
    same thing in every artifact.
    """
    t_end = time.time() + deadline_s
    while time.time() < t_end:
        bw = copy_bandwidth()
        if log:
            log({"name": "health", "gbps": round(bw, 1)})
        if lo < bw < hi:
            bw2 = copy_bandwidth()
            if log:
                log({"name": "health_confirm", "gbps": round(bw2, 1)})
            if lo < bw2 < hi:
                return True
            time.sleep(sleep_s / 2)
            continue
        time.sleep(sleep_s)
    return False


def stall_watchdog(artifact_path: str, stall_s: float = 1500.0) -> None:
    """Hard-exit(3) when `artifact_path` stops growing for `stall_s`.

    Device probes append a log line after every measurement; if the
    tunneled service dies mid-call, the blocked RPC can never be
    interrupted in-process (observed: a probe frozen >29 min with zero
    CPU). The watchdog turns that into a clean exit code 3 so a wrapper
    loop can wait for the service (scripts/tpu_waitup.py) and relaunch.
    """
    import os
    import threading

    def _size() -> int:
        try:
            return os.path.getsize(artifact_path)
        except OSError:
            return -1

    def loop():
        last_size = _size()
        last_t = time.time()
        while True:
            time.sleep(30)
            s = _size()
            if s != last_size:
                last_size, last_t = s, time.time()
            elif time.time() - last_t > stall_s:
                print(f"stall_watchdog: {artifact_path} static for "
                      f"{stall_s:.0f}s — exiting 3", flush=True)
                os._exit(3)

    t = threading.Thread(target=loop, daemon=True)
    t.start()


def quick_bandwidth() -> float:
    """One cheap copy-chain bandwidth reading (~1-2 s warm) in GB/s.

    The stamp that rides along with every measurement row: not a gate
    by itself (a single reading can be a slope artifact), but recorded
    beside the number it contextualizes so artifact consumers can see
    what the device was doing AT measurement time instead of inferring
    it from a pre-flight minutes earlier. Returns -1.0 on a
    non-positive slope (congestion spike mid-probe)."""
    import jax.numpy as jnp

    shape = (16, 1 << 18)  # 16 MB x2 planes: big enough to be HBM-bound
    x = jnp.ones(shape, jnp.float32)
    y = jnp.ones(shape, jnp.float32)

    def mk(i):
        t = jnp.float32(1e-3 * (i + 1))
        return (x + t, y - t)

    # 3 chain lengths: with only 2, min_slope has a single pair and a
    # congested short chain deflates the estimate without bound
    # (observed: a 17,813 GB/s "reading" during a host-load spike).
    raw = chain_time(lambda a, b: (a + 1.0, b + 1.0), mk, ks=(6, 24, 64),
                     repeats=2, return_raw=True)
    dt = min_slope(raw)
    nbytes = 4.0 * 4 * shape[0] * shape[1]
    return (nbytes / dt / 1e9) if dt > 0 else -1.0


def slope_valid(ms: float, floor_ms: float | None = None) -> bool:
    """The round-validity guard (review r3 finding: omnibus recorded
    -6.02 ms rounds uninhibited). A per-application slope is DISCARDED,
    not merged, when it is non-positive or faster than the physical
    HBM floor for the op — both are measurement artifacts of a chain
    pair whose short end was congested, never real speed."""
    if not np.isfinite(ms) or ms <= 0.0:
        return False
    if floor_ms is not None and ms < floor_ms:
        return False
    return True


def min_slope(raw: dict) -> float:
    """Per-application seconds from a `chain_time(..., return_raw=True)`
    sample: slope between per-k MINIMUM chain times.

    On a multi-tenant service, congestion only ever ADDS time (each
    chain's completion is fenced by a readback), so min-over-repeats
    converges to the uncongested chain cost and a min-slope is robust
    where the median of per-repeat slopes can go negative under a
    single spike.

    With two chain lengths the estimate can still DEFLATE: if the short
    chain is congested in every repeat while the long chain catches one
    clean window, the slope comes out below the true cost — we observed
    a physically impossible 14.4 GS/s (2.5x the HBM floor) from exactly
    this failure. So with >= 3 chain lengths this returns the MAX over
    all pairwise min-slopes: each pair's slope is
    c + (e_long - e_short)/(k_long - k_short) with e_k >= 0 the
    residual congestion on that chain's best repeat, so under-estimates
    need e_short > 0 on every pair sharing its short end; the max picks
    the best-supported pair, and its bias is CONSERVATIVE (a congested
    long chain over-states time, never physics-breaking under-states).
    """
    ks = sorted(raw)
    m = {k: min(raw[k]) for k in ks}
    return max((m[b] - m[a]) / (b - a)
               for i, a in enumerate(ks) for b in ks[i + 1:])
