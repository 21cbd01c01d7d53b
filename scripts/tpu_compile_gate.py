"""Device-compile gate: prove every registered kernel route COMPILES on
real silicon before it is allowed to sit in a dispatch/tuning candidate
set.

Interpret-mode verification is not compile verification on this backend
(the round-1 VPU kernel was interpret-clean at 140 dB and hung Mosaic
forever; docs/performance.md "VPU butterfly kernel"). This gate runs
each route's minimal representative call in a KILLABLE subprocess with a
hard timeout — a compile hang cannot wedge the gate — and appends one
JSON row per candidate to bench_artifacts/compile_gate.jsonl:

  {"name": ..., "ok": true, "s": 41.2, "t": ...}          # compiled+ran
  {"name": ..., "ok": false, "err": "timeout", ...}        # hang/crash

Successful compiles land in the persistent cache (~/.cache/jax_comp),
so gating a candidate also pre-warms it for bench.py / the A/B probes.
Exit code: 0 if every candidate passed, 2 if any failed, 3 if the
service never answered the pre-flight ping (retryable under
scripts/probe_chain.sh).

Run: python scripts/tpu_compile_gate.py [--only substr] [--timeout S]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, ".")

ART = "bench_artifacts/compile_gate.jsonl"

_PRELUDE = """
import os
cache = os.path.expanduser('~/.cache/jax_comp')
import jax
jax.config.update('jax_compilation_cache_dir', cache)
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
import jax.numpy as jnp
import numpy as np
assert jax.devices()[0].platform == 'tpu', 'gate child not on TPU'
from fftlab.core.types import FORWARD
def planes(b, n, seed=0):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.standard_normal((b, n)), jnp.float32),
            jnp.asarray(r.standard_normal((b, n)), jnp.float32))
"""

# Every route / variant the dispatch, tuning, bench, or A/B layers may
# pick, at its minimal representative shape. Keep entries SMALL: the
# gate proves compilation, not speed.
CANDIDATES: dict[str, str] = {
    "pallas_vmem": """
from fftlab.kernels.fft_vmem import pallas_fft_split
xr, xi = planes(8, 8192)
pallas_fft_split(xr, xi, FORWARD)[0].block_until_ready()
""",
    "resident_vmem": """
from fftlab.kernels.resident_vmem import fft_split_resident
xr, xi = planes(2, 1 << 20)
fft_split_resident(xr, xi, FORWARD)[0].block_until_ready()
""",
    "resident_vmem_v4": """
from fftlab.kernels.resident_vmem import fft_split_resident
xr, xi = planes(2, 1 << 20)
fft_split_resident(xr, xi, FORWARD, layout="v4")[0].block_until_ready()
""",
    "resident_vmem_v6": """
from fftlab.kernels.resident_vmem import fft_split_resident
xr, xi = planes(2, 1 << 20)
fft_split_resident(xr, xi, FORWARD, layout="v6")[0].block_until_ready()
""",
    "resident_v6_3x": """
from fftlab.kernels.resident_vmem import fft_split_resident
xr, xi = planes(2, 1 << 20)
fft_split_resident(xr, xi, FORWARD, layout="v6",
                   prec="3x")[0].block_until_ready()
""",
    "resident_v4_3x": """
from fftlab.kernels.resident_vmem import fft_split_resident
xr, xi = planes(2, 1 << 20)
fft_split_resident(xr, xi, FORWARD, layout="v4",
                   prec="3x")[0].block_until_ready()
""",
    "threestep_2m": """
from fftlab.kernels.threestep_vmem import fft_split_huge
xr, xi = planes(2, 1 << 22)
fft_split_huge(xr, xi, FORWARD)[0].block_until_ready()
""",
    "resident_filter_v5": """
from fftlab.kernels.resident_vmem import spectral_filter_resident_v5
xr, xi = planes(2, 1 << 20)
h = jnp.ones(1 << 20, jnp.float32)
spectral_filter_resident_v5(xr, xi, h, jnp.zeros_like(h))[0]\
    .block_until_ready()
""",
    "resident_filter_v7": """
from fftlab.kernels.resident_vmem import spectral_filter_resident_v7
xr, xi = planes(2, 1 << 20)
h = jnp.ones(1 << 20, jnp.float32)
spectral_filter_resident_v7(xr, xi, h, jnp.zeros_like(h))[0]\
    .block_until_ready()
""",
    "rfft_resident": """
from fftlab.kernels.rfft_resident import rfft_resident
import jax.numpy as jnp
import numpy as np
x = jnp.asarray(np.zeros((2, 1 << 21), np.float32))
rfft_resident(x)[0].block_until_ready()
""",
    "irfft_resident": """
from fftlab.kernels.rfft_resident import irfft_resident
import jax.numpy as jnp
import numpy as np
h = (1 << 20) + 1
Xr = jnp.asarray(np.zeros((2, h), np.float32))
irfft_resident(Xr, Xr).block_until_ready()
""",
    "resident_filter_v5_3x": """
from fftlab.kernels.resident_vmem import spectral_filter_resident_v5
xr, xi = planes(2, 1 << 20)
h = jnp.ones(1 << 20, jnp.float32)
spectral_filter_resident_v5(xr, xi, h, jnp.zeros_like(h),
                            prec="3x")[0].block_until_ready()
""",
    "resident_vmem_r256": """
from fftlab.kernels.resident_vmem import fft_split_resident
xr, xi = planes(2, 1 << 20)
fft_split_resident(xr, xi, FORWARD, out_rows=256)[0].block_until_ready()
""",
    "resident_cio": """
from fftlab.kernels.resident_vmem import fft_split_resident_cio
xr, xi = planes(2, 1 << 20)
fft_split_resident_cio(xr, xi, FORWARD)[0].block_until_ready()
""",
    "resident_filter": """
from fftlab.kernels.resident_vmem import spectral_filter_resident
xr, xi = planes(2, 1 << 20)
h = jnp.ones(1 << 20, jnp.float32)
spectral_filter_resident(xr, xi, h, jnp.zeros_like(h))[0]\
    .block_until_ready()
""",
    "resident_filter_cio": """
from fftlab.kernels.resident_vmem import spectral_filter_resident_cio
xr, xi = planes(2, 1 << 20)
h = jnp.ones(1 << 20, jnp.float32)
spectral_filter_resident_cio(xr, xi, h, jnp.zeros_like(h))[0]\
    .block_until_ready()
""",
    "threestep_vmem_lanes": """
from fftlab.kernels.threestep_vmem import fft_split_huge
xr, xi = planes(1, 1 << 23)
fft_split_huge(xr, xi, FORWARD, lanes=True)[0].block_until_ready()
""",
    "fourstep_vmem": """
from fftlab.kernels.fourstep_vmem import fft_split_large
xr, xi = planes(2, 1 << 20)
fft_split_large(xr, xi, FORWARD)[0].block_until_ready()
""",
    "fourstep_vmem_blocked": """
from fftlab.kernels.fourstep_vmem import fft_split_large
xr, xi = planes(2, 1 << 20)
fft_split_large(xr, xi, FORWARD, blocked=True)[0].block_until_ready()
""",
    "fourstep_vmem_lanes": """
from fftlab.kernels.fourstep_vmem import fft_split_large
xr, xi = planes(2, 1 << 20)
fft_split_large(xr, xi, FORWARD, blocked=True, lanes=True)[0]\
    .block_until_ready()
""",
    "fourstep_filter_lanes": """
from fftlab.kernels.fourstep_vmem import spectral_filter_large
xr, xi = planes(2, 1 << 20)
h = jnp.ones(1 << 20, jnp.float32)
spectral_filter_large(xr, xi, h, jnp.zeros_like(h), blocked=True,
                      lanes=True)[0].block_until_ready()
""",
    "fourstep_vmem_rowmajor": """
from fftlab.kernels.fourstep_vmem import fft_split_large
xr, xi = planes(2, 1 << 20)
fft_split_large(xr, xi, FORWARD, blocked=False)[0].block_until_ready()
""",
    "fourstep_filter_blocked": """
from fftlab.kernels.fourstep_vmem import spectral_filter_large
xr, xi = planes(2, 1 << 20)
h = jnp.ones(1 << 20, jnp.float32)
spectral_filter_large(xr, xi, h, jnp.zeros_like(h), blocked=True)[0]\
    .block_until_ready()
""",
    "threestep_vmem": """
from fftlab.kernels.threestep_vmem import fft_split_huge
xr, xi = planes(1, 1 << 23)
fft_split_huge(xr, xi, FORWARD)[0].block_until_ready()
""",
    "threestep_vmem_blocked": """
from fftlab.kernels.threestep_vmem import fft_split_huge
xr, xi = planes(1, 1 << 23)
fft_split_huge(xr, xi, FORWARD, blocked=True)[0].block_until_ready()
""",
    "pallas_pipeline": """
from fftlab.kernels.stage_fused import fft_split_pipeline, pipeline_factors
xr, xi = planes(2, 1 << 16)
fft_split_pipeline(xr, xi, FORWARD,
                   factors=pipeline_factors(1 << 16))[0]\
    .block_until_ready()
""",
    "os_filter_vmem": """
from fftlab.kernels.os_filter_vmem import pallas_os_filter_split
xr, xi = planes(1, 1 << 18)
h = np.random.default_rng(1).standard_normal(129).astype(np.float32)
pallas_os_filter_split(xr[0], xi[0], h)[0].block_until_ready()
""",
    "stft_vmem": """
from fftlab.kernels.stft_vmem import pallas_stft_split
x = planes(1, 1 << 17)[0][0]
pallas_stft_split(x, 2048, 512)[0].block_until_ready()
""",
    "rfft_pack": """
from fftlab.kernels.rfft_vmem import pallas_pack_real
x = planes(8, 1 << 21)[0]
pallas_pack_real(x)[0].block_until_ready()
""",
    "rfft_unpack": """
from fftlab.kernels.rfft_vmem import pallas_hermitian_unpack
zr, zi = planes(8, 1 << 20)
pallas_hermitian_unpack(zr, zi, 1 << 21)[0].block_until_ready()
""",
    "rfft_interleave": """
from fftlab.kernels.rfft_vmem import pallas_interleave
zr, zi = planes(8, 1 << 20)
pallas_interleave(zr, zi).block_until_ready()
""",
    "stft_vmem_small": """
from fftlab.kernels.stft_vmem import pallas_stft_split
x = planes(1, 1 << 16)[0][0]
pallas_stft_split(x, 256, 128)[0].block_until_ready()
""",
}


def log(row: dict) -> None:
    row["t"] = round(time.time(), 1)
    os.makedirs("bench_artifacts", exist_ok=True)
    with open(ART, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(row, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default="", help="substring filter")
    ap.add_argument("--timeout", type=float,
                    default=float(os.environ.get("GATE_TIMEOUT_S", "900")),
                    help="per-candidate hard timeout (cold compiles over "
                         "this tunnel cost 40-120 s healthy, minutes "
                         "congested)")
    args = ap.parse_args()

    # Pre-flight ping from a fresh subprocess (a dead service wedges any
    # in-process device op forever).
    ping = ("import jax, jax.numpy as jnp; "
            "(jnp.ones((8,128), jnp.float32) + 1.0).block_until_ready(); "
            "print('up', jax.devices()[0].platform)")
    try:
        r = subprocess.run([sys.executable, "-c", ping], timeout=240,
                           capture_output=True, text=True)
        if r.returncode != 0 or "up tpu" not in r.stdout:
            log({"name": "gate_abort", "err": "service ping failed"})
            return 3
    except subprocess.TimeoutExpired:
        log({"name": "gate_abort", "err": "service ping timed out"})
        return 3

    # GATE_ONLY: comma-separated EXACT names (campaign scripts); --only
    # remains the substring form for interactive use.
    only_exact = {s for s in os.environ.get("GATE_ONLY", "").split(",")
                  if s}
    failed = []
    for name, body in CANDIDATES.items():
        if only_exact and name not in only_exact:
            continue
        if args.only and args.only not in name:
            continue
        t0 = time.time()
        try:
            r = subprocess.run(
                [sys.executable, "-c", _PRELUDE + body],
                timeout=args.timeout, capture_output=True, text=True)
            ok = r.returncode == 0
            err = "" if ok else (r.stderr or r.stdout or "")[-200:]
        except subprocess.TimeoutExpired:
            ok, err = False, f"timeout after {args.timeout:.0f}s (hang?)"
        row = {"name": name, "ok": ok, "s": round(time.time() - t0, 1)}
        if err:
            row["err"] = err
        log(row)
        if not ok:
            failed.append(name)
    log({"name": "gate_done", "failed": failed})
    return 2 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
