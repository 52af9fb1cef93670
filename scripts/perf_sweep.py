#!/usr/bin/env python3
"""Block-geometry sweep for the multi-step Pallas kernel (perf tooling).

For each (BX, BY) pair, spawns a fresh subprocess (the kernel-build cache
keys on the CLIMATE_SIM_BX/BY env overrides, but a clean process also
isolates XLA autotuning state) that times the fused multi-step advance on
the real chip with the bench.py protocol (AOT compile, N dispatched chunks
per sync, best of trials).  Prints one line per config plus the winner.

Usage:
    python scripts/perf_sweep.py --nx 4096 --ny 4096 \
        --bx 0 1024 2048 4096 --by 0 64 128 256 512
(0 means "kernel default".)
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
import numpy as np, jax, jax.numpy as jnp
# The image's sitecustomize force-registers the axon backend regardless of
# JAX_PLATFORMS; reclaim CPU explicitly for dry-runs (same dance as
# tests/conftest.py).
if os.environ.get("CLIMATE_SIM_PLATFORM") == "cpu":
    jax.config.update("jax_platforms", "cpu")
from climate_sim_tpu.benchproto import aot_compile, bench_config, time_best_of
from climate_sim_tpu.ops.init import gaussian_hotspot
from climate_sim_tpu.ops.step import build_single_device_advance

nx, ny, chunk, reps, trials = (int(a) for a in sys.argv[1:6])
dtype = getattr(jnp, sys.argv[6]) if len(sys.argv) > 6 else jnp.float32
cfg = bench_config(nx, ny, chunk)
fn = aot_compile(build_single_device_advance(cfg, cfg.dt)(chunk),
                 u := jax.device_put(gaussian_hotspot(cfg, dtype), jax.devices()[0]),
                 label="sweep")
best, _ = time_best_of(fn, u, reps, trials)
print(json.dumps({"gpts": nx * ny * chunk * reps / best / 1e9}))
"""


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--ny", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--bx", type=int, nargs="+", default=[0])
    ap.add_argument("--by", type=int, nargs="+", default=[0])
    ap.add_argument("--dtype", default="float32",
                    choices=["float32", "bfloat16"])
    a = ap.parse_args()

    results = []
    for bx, by in itertools.product(a.bx, a.by):
        env = dict(os.environ)
        env.pop("CLIMATE_SIM_BX", None)
        env.pop("CLIMATE_SIM_BY", None)
        if bx:
            env["CLIMATE_SIM_BX"] = str(bx)
        if by:
            env["CLIMATE_SIM_BY"] = str(by)
        r = subprocess.run(
            [sys.executable, "-c", WORKER, str(a.nx), str(a.ny),
             str(a.chunk), str(a.reps), str(a.trials), a.dtype],
            cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=1200,
        )
        tag = f"BX={bx or 'auto'} BY={by or 'auto'} {a.dtype}"
        if r.returncode != 0:
            print(f"{tag}: FAILED\n{r.stderr[-500:]}", flush=True)
            continue
        g = json.loads(r.stdout.strip().splitlines()[-1])["gpts"]
        results.append((g, tag))
        print(f"{tag}: {g:.2f} Gpt/s", flush=True)

    if results:
        g, tag = max(results)
        print(f"BEST: {tag} -> {g:.2f} Gpt/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
