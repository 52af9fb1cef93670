#!/usr/bin/env python3
"""bf16 STORAGE-mode study: error growth vs f32 + throughput on the real chip.

``precision: bf16`` runs the Pallas chained kernel with bf16 HBM/VMEM
storage and f32 in-kernel arithmetic — one bf16 rounding per k-step pass
(ops/pallas_stencil.py, the chained-branch cast).  This script produces the
two numbers that make it a characterized mode rather than a checkbox:

1. ERROR GROWTH: max-abs and relative-L2 error of the bf16 run vs the f32
   run from the SAME bf16-cast IC, per BC class, at 1k/10k/60k steps.
   The model expectation: ~2^-8 * field-scale per pass rounding,
   accumulating as a damped random walk under diffusion (NOT linearly).
2. THROUGHPUT: 4096² grid-points/s for bf16 vs f32 under the amortized
   6000-step protocol.  The kernel is VPU-issue-bound (docs/performance.md),
   so halving HBM bytes is NOT expected to raise throughput — the honest
   outcome either way is recorded in docs/performance.md "bf16".

Usage:  python scripts/bf16_study.py [--horizons 1000 10000 60000]
        [--err-size 1024] [--perf-size 4096] [--skip-perf]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--horizons", type=int, nargs="+",
                    default=[1000, 10000, 60000])
    ap.add_argument("--err-size", type=int, default=1024)
    ap.add_argument("--perf-size", type=int, default=4096)
    ap.add_argument("--perf-steps", type=int, default=6000)
    ap.add_argument("--skip-perf", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from climate_sim_tpu.config import BCConfig, BCType, SimConfig
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import build_single_device_advance

    D, N, P = BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
    BCS = {
        "dirichlet4": (D, D, D, D),
        "torus": (P, P, P, P),
        "mixed": (D, N, P, P),
        "one_sided_y": (P, P, P, D),
    }

    def cfg_for(bcs, n, steps):
        cfg = SimConfig(nx=n, ny=n, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                        steps=steps, out_every=min(steps, 2000))
        cfg.bc = BCConfig(*bcs)
        return cfg

    def evolve(u0, cfg, steps):
        adv = build_single_device_advance(cfg, cfg.dt)
        u = jax.device_put(u0)
        n = 0
        while n < steps:
            kk = min(2000, steps - n)
            u = adv(kk)(u)
            n += kk
        return np.asarray(jax.device_get(u), np.float64)

    horizon_max = max(args.horizons)
    print(f"device={jax.devices()[0].device_kind}  err grid "
          f"{args.err_size}^2, horizons {args.horizons}")
    print(f"{'bc':12s} {'steps':>6s} {'max_abs_err':>12s} {'rel_l2':>10s} "
          f"{'f32_max':>9s}")
    for name, bcs in BCS.items():
        for steps in args.horizons:
            if steps > horizon_max:
                continue
            cfg = cfg_for(bcs, args.err_size, steps)
            u_b = gaussian_hotspot(cfg, jnp.bfloat16)
            u_f = u_b.astype(jnp.float32)  # identical (bf16-cast) IC
            f = evolve(u_f, cfg, steps)
            b = evolve(u_b, cfg, steps)
            d = np.abs(b - f)
            rel_l2 = float(np.sqrt((d ** 2).sum() / max((f ** 2).sum(), 1e-30)))
            print(f"{name:12s} {steps:6d} {d.max():12.3e} {rel_l2:10.3e} "
                  f"{np.abs(f).max():9.3e}", flush=True)

    if args.skip_perf:
        return 0

    # ---- throughput, amortized protocol ----
    from climate_sim_tpu.benchproto import aot_compile, time_best_of

    n = args.perf_size
    cfg = cfg_for(BCS["mixed"], n, args.perf_steps)
    for prec, dt_ in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        u0 = jax.device_put(gaussian_hotspot(cfg, dt_))
        adv = build_single_device_advance(cfg, cfg.dt)
        fn = aot_compile(adv(2000), u0, label=f"bf16_study:{prec}")
        best, _ = time_best_of(fn, u0, args.perf_steps // 2000, 3)
        g = n * n * args.perf_steps / best / 1e9
        print(f"perf {prec}: {g:.2f} Gpt/s at {n}^2 "
              f"({args.perf_steps} steps, best of 3)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
