#!/usr/bin/env python3
"""Per-shard throughput of the sharded kernel paths on ONE real chip.

A 1x1 mesh engages the full sharded machinery (shard_map, SMEM edge flags,
slab exchange / overlap band split), so the kernel-side cost of each path
is measurable without multi-chip hardware — the difference vs a real mesh
is only ICI transfer time, which the overlap path exists to hide (see
docs/performance.md).  Size-1 mesh axes skip the degenerate self-ppermute
entirely (parallel/halo._pshift), so these numbers are pure per-shard
kernel+exchange-assembly cost; collective lowering is validated separately
on the multi-device virtual mesh (tests/ + dryrun_multichip).

Defaults run the window-matched protocol (chunk=2000, reps auto-scaled
to a ~1 s device window): the old chunk=100/reps=5 defaults read ~2.5x
low through the tunnel (dispatch-dominated), and even the 6000-step
r03/r04 protocol paid a ~6-8% per-sync tax at 4096^2 (docs/performance.md
"Measuring through the tunnel" — ratios were unaffected).

Paths timed at --nx/--ny per shard (default 4096^2):
  single    — build_single_device_advance (no shard_map): the ceiling
  slab      — build_sharded_multistep_advance, slab-input fast path
  overlap   — build_sharded_overlap_advance (interior + 4 bands + stitch)
  perstep   — build_sharded_advance (width-1 exchange every step, jnp ghosts)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np
# Importable when invoked as `python scripts/<name>.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--ny", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=0,
                    help="chained chunks per sync; 0 = auto-scale to a "
                         "~1 s device window (fixed-reps protocols "
                         "under-read by the per-sync tax's relative "
                         "weight — docs/performance.md 'Measuring "
                         "through the tunnel')")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU dry-runs; timings "
                         "meaningless)")
    ap.add_argument("--paths", nargs="+",
                    default=["single", "slab", "overlap"],
                    choices=["single", "slab", "overlap", "perstep"])
    ap.add_argument("--bc", default="bench",
                    choices=["bench", "dirichlet", "one_sided_y",
                             "one_sided_x", "both_one_sided"],
                    help="BC class (bench = the canonical mixed workload; "
                         "the one-sided classes time the wrap-patch "
                         "paths)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # Reclaim CPU for dry-runs despite the image's forced axon backend
    # (same dance as tests/conftest.py).
    if os.environ.get("CLIMATE_SIM_PLATFORM") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from climate_sim_tpu.benchproto import (
        aot_compile, auto_reps, bench_config, time_best_of,
    )
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import build_single_device_advance, make_interior_step
    from climate_sim_tpu.parallel.halo import (
        build_sharded_advance,
        build_sharded_multistep_advance,
        build_sharded_overlap_advance,
    )
    from climate_sim_tpu.parallel.mesh import field_sharding, make_mesh

    cfg = bench_config(a.nx, a.ny, a.chunk)
    if a.bc != "bench":
        from climate_sim_tpu.config import BCConfig, BCType

        D, N, P = BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
        cfg.bc = BCConfig(*{
            "dirichlet": (D, D, D, D),
            "one_sided_y": (D, N, P, D),
            "one_sided_x": (P, D, N, D),
            "both_one_sided": (P, D, P, N),
        }[a.bc])

    mesh = make_mesh(1, 1)
    u_sharded = jax.device_put(gaussian_hotspot(cfg, jnp.float32),
                               field_sharding(mesh))
    u_single = jax.device_put(gaussian_hotspot(cfg, jnp.float32),
                              jax.devices()[0])

    def build(path):
        if path == "single":
            return build_single_device_advance(cfg, cfg.dt), u_single
        if path == "slab":
            adv = build_sharded_multistep_advance(
                cfg, mesh, cfg.dt, interpret=a.interpret)
            if adv is None:
                return None, None
            print(f"[bench] slab path uses_slabs={getattr(adv, 'uses_slabs', '?')}",
                  file=sys.stderr)
            return adv, u_sharded
        if path == "overlap":
            return build_sharded_overlap_advance(
                cfg, mesh, cfg.dt, interpret=a.interpret), u_sharded
        interior = make_interior_step(cfg, cfg.dt)
        return build_sharded_advance(cfg, mesh, cfg.dt, interior), u_sharded

    reps = a.reps or auto_reps(a.nx, a.ny, a.chunk)
    for path in a.paths:
        adv, u0 = build(path)
        if adv is None:
            print(f"{path}: unavailable for this shape", flush=True)
            continue
        fn = aot_compile(adv(a.chunk), u0, label=f"bench:{path}")
        best, _ = time_best_of(fn, u0, reps, a.trials)
        g = a.nx * a.ny * a.chunk * reps / best / 1e9
        print(f"{path}: {g:.2f} Gpt/s/shard (reps={reps})", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
