#!/usr/bin/env python3
"""Padded-carrier throughput on ONE real chip (1x1 mesh, amortized protocol).

Measures the carrier path (indivisible/misaligned grids) and, for
comparison, the single-device path on the same grid (which takes the
assembled-kernel fallback for non-128-multiple widths).  Same 6000-step
protocol as scripts/sharded_path_bench.py — numbers are comparable to the
slab/single rates in docs/performance.md.

Usage:  python scripts/carrier_bench.py [--sizes 4000 5000]
        [--bc mixed|torus|one_sided_y|one_sided_x] [--chunk 2000 --reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", type=int, nargs="+", default=[4000, 5000])
    ap.add_argument("--bc", default="mixed",
                    choices=["mixed", "torus", "one_sided_y", "one_sided_x"])
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=0,
                    help="chained chunks per sync; 0 = auto-scale so the "
                         "measured device window is ~1 s regardless of "
                         "grid size — fixed-reps timing under-reads "
                         "small grids by 10-25% because the tunnel's "
                         "fixed per-sync cost is amortized over a "
                         "shrinking window (docs/performance.md)")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--steps-per-pass", type=int, default=0)
    ap.add_argument("--single", action="store_true",
                    help="also time the single-device path on the same grid")
    ap.add_argument("--precision", default="f32", choices=["f32", "bf16"],
                    help="bf16 = storage mode (16-row staging quantum)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from climate_sim_tpu.benchproto import (
        aot_compile, auto_reps, bench_config, time_best_of,
    )
    from climate_sim_tpu.config import BCConfig, BCType
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import build_single_device_advance
    from climate_sim_tpu.parallel.halo import build_carrier_slab_advance
    from climate_sim_tpu.parallel.mesh import make_mesh

    D, N, P = BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
    bcs = {
        "mixed": (D, N, D, N),
        "torus": (P, P, P, P),
        "one_sided_y": (D, N, P, D),
        "one_sided_x": (D, P, N, D),
    }[a.bc]

    mesh = make_mesh(1, 1)
    for n in a.sizes:
        reps = a.reps or auto_reps(n, n, a.chunk)
        cfg = bench_config(n, n, a.chunk)
        cfg.bc = BCConfig(*bcs)
        cfg.steps_per_pass = a.steps_per_pass
        dtype = jnp.bfloat16 if a.precision == "bf16" else jnp.float32
        adv = build_carrier_slab_advance(
            cfg, mesh, cfg.dt, dtype_name=jnp.dtype(dtype).name
        )
        if adv is None:
            print(f"{n}^2 {a.bc}: carrier unavailable", flush=True)
            continue
        u0 = gaussian_hotspot(cfg, dtype)
        c0 = adv.embed(u0)
        fn = aot_compile(adv(a.chunk), c0, label=f"carrier:{n}")
        best, _ = time_best_of(fn, c0, reps, a.trials)
        g = n * n * a.chunk * reps / best / 1e9
        ncy, ncx = adv.carrier_shape
        print(f"{n}^2 {a.bc}: carrier {g:.2f} Gpt/s "
              f"(carrier {ncx}x{ncy}, reps={reps})", flush=True)
        if a.single:
            s = build_single_device_advance(cfg, cfg.dt)
            fs = aot_compile(s(a.chunk), jax.device_put(u0), label=f"single:{n}")
            bs, _ = time_best_of(fs, jax.device_put(u0), reps, a.trials)
            print(f"{n}^2 {a.bc}: single  "
                  f"{n * n * a.chunk * reps / bs / 1e9:.2f} Gpt/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
