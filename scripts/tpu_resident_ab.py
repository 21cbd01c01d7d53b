"""Health-gated interleaved A/B: resident_vmem (one-residency, v2
BlockSpec) vs fourstep_vmem (blocked two-pass) for the 16x1M FFT and
the 1M spectral-filter sandwich. Waits for a healthy window (copy-chain
bandwidth > 150 GB/s), then times all four candidates back-to-back,
repeating for several healthy rounds so the judge artifact carries
same-window comparisons.

Appends to bench_artifacts/resident_ab.jsonl.
"""
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

ART = "bench_artifacts/resident_ab.jsonl"


def log(**kw):
    kw["t"] = round(time.time(), 1)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def main():
    from fftlab.bench.timing import stall_watchdog

    # A dead service wedges any device call forever; generous stall line
    # because cold compiles + congested readbacks sit between log rows.
    stall_watchdog(ART, stall_s=3000.0)
    assert jax.devices()[0].platform == "tpu"
    from fftlab.bench.timing import chain_time, min_slope
    from fftlab.core.types import FORWARD
    from fftlab.kernels.fourstep_vmem import (
        fft_split_large,
        spectral_filter_large,
    )
    from fftlab.kernels.resident_vmem import (
        fft_split_resident,
        fft_split_resident_cio,
        spectral_filter_resident,
        spectral_filter_resident_cio,
    )

    B, n = 16, 1 << 20
    rng = np.random.default_rng(0)
    xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
    scale = 1.0 / float(np.sqrt(n))
    H = rng.standard_normal(n).astype(np.float32)
    hr = jnp.asarray(H)
    hi = jnp.zeros(n, jnp.float32)

    cands = [
        ("res", lambda a, b: fft_split_resident(a, b, FORWARD, scale=scale)),
        # v4: transposes moved to phase A with static slicing (r3).
        ("res_v4", lambda a, b: fft_split_resident(
            a, b, FORWARD, scale=scale, layout="v4")),
        # Wider strided-write bursts (1 KB at stride L1*4): the roadmap's
        # two-rows-in-flight variant, expressed as out_rows=2*default.
        ("res_r256", lambda a, b: fft_split_resident(
            a, b, FORWARD, scale=scale, out_rows=256)),
        # v3: every HBM edge contiguous (copy-in/out phases in VMEM).
        ("res_cio", lambda a, b: fft_split_resident_cio(
            a, b, FORWARD, scale=scale)),
        ("fs_blocked", lambda a, b: fft_split_large(
            a, b, FORWARD, blocked=True, scale=scale)),
        ("resfilt", lambda a, b: spectral_filter_resident(a, b, hr, hi)),
        ("resfilt_cio", lambda a, b: spectral_filter_resident_cio(
            a, b, hr, hi)),
        ("fsfilt_blocked", lambda a, b: spectral_filter_large(
            a, b, hr, hi, blocked=True)),
    ]

    # NEW kernel formulations (this round's cio variants + the R sweep)
    # warm in KILLABLE subprocesses first: a Mosaic compile hang on an
    # unproven structure would wedge this process for the whole stall
    # window and starve the proven candidates. The persistent compile
    # cache carries a successful subprocess compile into this process;
    # a hung one is killed and its candidate dropped.
    child_tmpl = (
        "import os\n"
        "cache = os.path.expanduser('~/.cache/jax_comp')\n"
        "import jax\n"
        "jax.config.update('jax_compilation_cache_dir', cache)\n"
        "jax.config.update('jax_persistent_cache_min_compile_time_secs',"
        " 1.0)\n"
        "import jax.numpy as jnp, numpy as np\n"
        "assert jax.devices()[0].platform == 'tpu', 'child not on TPU'\n"
        "B, n = 16, 1 << 20\n"
        "xr = jnp.zeros((B, n), jnp.float32)\n"
        "xi = jnp.zeros((B, n), jnp.float32)\n"
        "scale = 1.0 / float(np.sqrt(n))\n"
        "{body}\n"
        "print('warmed')\n"
    )
    risky = {
        "res_r256": (
            "from fftlab.kernels.resident_vmem import fft_split_resident\n"
            "from fftlab.core.types import FORWARD\n"
            "fft_split_resident(xr, xi, FORWARD, scale=scale,"
            " out_rows=256)[0].block_until_ready()"
        ),
        "res_cio": (
            "from fftlab.kernels.resident_vmem import"
            " fft_split_resident_cio\n"
            "from fftlab.core.types import FORWARD\n"
            "fft_split_resident_cio(xr, xi, FORWARD,"
            " scale=scale)[0].block_until_ready()"
        ),
        "resfilt_cio": (
            "from fftlab.kernels.resident_vmem import"
            " spectral_filter_resident_cio\n"
            "hr = jnp.zeros(n, jnp.float32)\n"
            "hi = jnp.zeros(n, jnp.float32)\n"
            "spectral_filter_resident_cio(xr, xi, hr,"
            " hi)[0].block_until_ready()"
        ),
    }
    import subprocess

    dropped = set()
    for name, body in risky.items():
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", child_tmpl.format(body=body)],
                timeout=float(os.environ.get("AB_WARM_TIMEOUT_S", "1200")),
                capture_output=True, text=True)
            ok = r.returncode == 0 and "warmed" in r.stdout
            err = "" if ok else (r.stderr or "")[-160:]
        except subprocess.TimeoutExpired:
            ok, err = False, "subprocess warm timed out (compile hang?)"
        log(name=f"subwarm_{name}", ok=ok,
            s=round(time.time() - t0, 1), **({"err": err} if err else {}))
        if not ok:
            dropped.add(name)
    cands = [(n_, f) for n_, f in cands if n_ not in dropped]

    # warm all compiles before any health gating (cache hits after the
    # subprocess warms; proven kernels compile from their cached r2 form)
    for name, fn in cands:
        t0 = time.time()
        fn(xr, xi)[0].block_until_ready()
        log(name=f"warm_{name}", compile_s=round(time.time() - t0, 1))

    counter = [0]

    def nxt():
        counter[0] += 1
        return counter[0]

    def bandwidth():
        mk = lambda i: (xr + jnp.float32(nxt() * 1e-3),
                        xi - jnp.float32(nxt() * 1e-3))
        raw = chain_time(lambda a, b: (a + 1.0, b + 1.0), mk, ks=(4, 64),
                         repeats=3, return_raw=True)
        dt = min_slope(raw)
        return (2 * 2 * 4 * B * n / dt / 1e9) if dt > 0 else -1.0

    # Known-healthy signature from prior sessions: 150-400 GB/s copy
    # chain and fs_blocked in 2.4-6 ms. Readings of 700-4000 GB/s are
    # tunnel ARTIFACTS (deflated slopes), not health — require TWO
    # consecutive in-band readings before burning a round, and COUNT a
    # round only when the control lands inside its plausible window.
    deadline = time.time() + float(os.environ.get("AB_WAIT_S", "14400"))
    healthy_rounds = 0
    want_rounds = int(os.environ.get("AB_ROUNDS", "3"))
    in_band = lambda g: 150.0 < g < 400.0
    strikes = 0
    while healthy_rounds < want_rounds and time.time() < deadline:
        bw = bandwidth()
        log(name="health", gbps=round(bw, 1))
        if not in_band(bw):
            # The copy-chain slope is itself jitter-prone (negative
            # slopes observed on an otherwise-healthy service). After two
            # consecutive out-of-band readings, proceed ADVISORY: the
            # round only counts if the fs_blocked control lands in its
            # 2-8 ms plausibility window, which is the authoritative
            # health signal — a dead/congested service can't fake it.
            strikes += 1
            if strikes < 2:
                time.sleep(45)
                continue
            log(name="health_advisory", gbps=round(bw, 1),
                note="bandwidth gate out of band twice; trusting the "
                     "control-window count instead")
            bw2 = bw
        else:
            bw2 = bandwidth()
            log(name="health_confirm", gbps=round(bw2, 1))
            if not in_band(bw2):
                strikes += 1
                time.sleep(30)
                continue
        strikes = 0
        rnd = {"name": "ab_round", "round": healthy_rounds,
               "health_gbps": round(bw2, 1)}
        for name, fn in cands:
            try:
                raw = chain_time(fn,
                                 lambda i: (xr + jnp.float32(1e-3 * nxt()),
                                            xi - jnp.float32(1e-3 * nxt())),
                                 ks=(3, 8, 14), repeats=3, return_raw=True)
                dt = min_slope(raw)
                rnd[name + "_ms"] = round(dt * 1e3, 4)
                rnd[name + "_gsps"] = (round(B * n / dt / 1e9, 2)
                                       if dt > 0 else -1.0)
            except Exception as ex:  # noqa: BLE001
                rnd[name + "_err"] = str(ex)[:160]
        ctrl = rnd.get("fs_blocked_ms", -1.0)
        rnd["counted"] = bool(2.0 <= ctrl <= 8.0)
        log(**rnd)
        if rnd["counted"]:
            healthy_rounds += 1
    log(name="done", healthy_rounds=healthy_rounds)
    # 3 = retryable to probe_chain.sh when NO healthy round was counted.
    return 0 if healthy_rounds else 3


if __name__ == "__main__":
    sys.exit(main())
