"""MXU-precision A/B: HIGHEST (bf16_6x) vs 3x (bf16_3x) on the 1M
resident kernels + the two-pass control, same window.

The resident kernel at 2^20 sits near the compute/memory crossover:
its DFT contractions run 6 bf16 MXU passes per f32 matmul at HIGHEST.
bf16_3x halves the MXU work; if the kernel is MXU-bound (the r3 gap:
1.61 ms vs the 0.94 ms one-residency floor) the win is real, and the
SNR gate (>=100 dB vs the f64 oracle) decides whether the precision
still clears the bar. Each arm runs in a FRESH subprocess because the
precision is read at kernel-module import (FFTLAB_MXU_PRECISION).

Appends to bench_artifacts/prec_ab.jsonl. Counted when the control
(fs_blocked at HIGHEST) lands in its 2.0-8.0 ms plausibility window.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ART = "bench_artifacts/prec_ab.jsonl"

ARM = r"""
import json, os, sys
sys.path.insert(0, ".")
cache = os.path.expanduser("~/.cache/jax_comp")
import jax
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from fftlab.bench.timing import chain_time, min_slope
from fftlab.core.types import FORWARD
from fftlab.kernels.resident_vmem import fft_split_resident
from fftlab.kernels.fourstep_vmem import fft_split_large

B, n = 16, 1 << 20
rng = np.random.default_rng(0)
xr = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
xi = jnp.asarray(rng.standard_normal((B, n)), jnp.float32)
scale = 1.0 / float(np.sqrt(n))
want = np.fft.fft(np.asarray(xr[0], np.float64)
                  + 1j * np.asarray(xi[0], np.float64)) * scale

out = {"prec": os.environ.get("FFTLAB_MXU_PRECISION", "highest")}
cands = {
    "res_v6": lambda a, b: fft_split_resident(a, b, FORWARD, scale=scale,
                                              layout="v6"),
    "res_v4": lambda a, b: fft_split_resident(a, b, FORWARD, scale=scale,
                                              layout="v4"),
    "fs_blocked": lambda a, b: fft_split_large(a, b, FORWARD,
                                               blocked=True, scale=scale),
}
for name, fn in cands.items():
    gr, gi = fn(xr[:1], xi[:1])
    got = (np.asarray(gr[0], np.float64)
           + 1j * np.asarray(gi[0], np.float64))
    err = np.sum(np.abs(got - want) ** 2)
    sig = np.sum(np.abs(want) ** 2)
    out[name + "_snr_db"] = round(float(10 * np.log10(sig / max(err, 1e-300))), 1)
    try:
        raw = chain_time(fn, lambda i: (xr + jnp.float32(1e-3 * i),
                                        xi - jnp.float32(1e-3 * i)),
                         ks=(3, 8, 14), repeats=3, return_raw=True)
        out[name + "_ms"] = round(min_slope(raw) * 1e3, 4)
    except Exception as ex:
        out[name + "_err"] = str(ex)[:160]
print("ARM_RESULT " + json.dumps(out))
"""


def log(**kw):
    kw["t"] = round(time.time(), 1)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


def run_arm(prec: str, timeout_s: float) -> dict | None:
    env = dict(os.environ, FFTLAB_MXU_PRECISION=prec)
    try:
        r = subprocess.run([sys.executable, "-c", ARM], env=env,
                           timeout=timeout_s, capture_output=True,
                           text=True)
    except subprocess.TimeoutExpired:
        log(name="arm_timeout", prec=prec)
        return None
    for line in r.stdout.splitlines():
        if line.startswith("ARM_RESULT "):
            return json.loads(line[len("ARM_RESULT "):])
    log(name="arm_failed", prec=prec, rc=r.returncode,
        tail=(r.stderr or r.stdout)[-300:])
    return None


def main() -> int:
    from fftlab.bench.timing import stall_watchdog

    stall_watchdog(ART, stall_s=2400.0)
    deadline = time.time() + float(os.environ.get("PREC_WAIT_S", "7200"))
    want = int(os.environ.get("PREC_ROUNDS", "2"))
    counted = 0
    while counted < want and time.time() < deadline:
        row = {"name": "prec_round", "round": counted}
        hi = run_arm("highest", 1200.0)
        lo = run_arm("3x", 1200.0)
        if hi:
            row.update({("hi_" + k): v for k, v in hi.items()
                        if k != "prec"})
        if lo:
            row.update({("lo_" + k): v for k, v in lo.items()
                        if k != "prec"})
        ctrl = row.get("hi_fs_blocked_ms", -1.0)
        # Round validity (r4): control in band AND every slope in the
        # round physically possible — one negative/sub-floor entry
        # means congestion moved WITHIN the round, so no same-window
        # comparison exists in it.
        floor_ms = 16.0 * 16 * (1 << 20) / (400.0 * 1e9) * 1e3
        ms_vals = [v for k, v in row.items() if k.endswith("_ms")]
        row["counted"] = bool(2.0 <= ctrl <= 8.0 and ms_vals
                              and all(v >= floor_ms for v in ms_vals))
        log(**row)
        if row["counted"]:
            counted += 1
        else:
            time.sleep(60)
    log(name="done", counted=counted)
    return 0 if counted else 3


if __name__ == "__main__":
    sys.exit(main())
