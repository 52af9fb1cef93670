#!/usr/bin/env python3
"""Hardware RATE-regression gate: same-session throughput ratios.

``hw_conformance.py`` checks correctness only — a refactor that halves a
path's throughput passes every correctness gate.  This script times each
production kernel path against the single-device fused run executed in
the SAME session and asserts the ratio inside a generous band: the
tunneled chip's absolute clock varies ~±20% between sessions, but
path-vs-path ratios within one session are stable to a few percent
(docs/performance.md records both instances of this), so banded RATIOS
catch a 2x path regression without flaking on session clock.

Expected ratios (v5e, 4096² f32, 6000-step amortized protocol — see
BASELINE.md r04/r05 for the underlying absolutes):

  path                    expected   band (lo, hi)
  single mixed (denom)    —          absolute floor 100 Gpt/s
  single torus            ~1.00      [0.75, 1.40]
  single bf16             ~1.01      [0.75, 1.40]
  slab dirichlet (1x1)    ~0.97      [0.70, 1.30]
  slab one-sided-y (1x1)  ~0.95      [0.68, 1.30]
  carrier 4000² mixed     ~0.90      [0.60, 1.30]
  carrier 2500² (byexp)   ~0.88      [0.55, 1.30]  (guards the height
                                      expansion: 0.36 without it)
  overlap mixed (1x1)     ~0.65      [0.35, 1.10]   (large-tile overlap is
                                      known-slow; auto policy never picks
                                      it here — band only catches a
                                      further collapse)
  perstep fallback (1x1)  ~0.12      [0.07, 0.25]  (24.5 Gpt/s class,
                                      docs/performance.md r03; first gate
                                      run measured 0.122)

The hi bounds also catch a DENOMINATOR collapse that absolute floors
would miss at path level.  Exits nonzero on any violation.  Runtime:
~4-6 min through the tunnel (compiles dominate).

Usage:  python scripts/hw_rates.py [--chunk 2000 --reps 3 --trials 2]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--chunk", type=int, default=2000)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--ny", type=int, default=4096)
    ap.add_argument("--floor", type=float, default=100.0,
                    help="absolute Gpt/s floor for the single-device "
                         "denominator (expected 190-230; ±20% session "
                         "clock never reads below ~150)")
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if jax.devices()[0].platform == "cpu":
        print("[hw_rates] WARNING: running on CPU — rates are meaningless; "
              "exiting 0 without asserting", file=sys.stderr)
        return 0

    from climate_sim_tpu.benchproto import aot_compile, bench_config, time_best_of
    from climate_sim_tpu.config import BCConfig, BCType
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import (
        build_single_device_advance,
        make_interior_step,
    )
    from climate_sim_tpu.parallel.halo import (
        build_carrier_slab_advance,
        build_sharded_advance,
        build_sharded_multistep_advance,
        build_sharded_overlap_advance,
    )
    from climate_sim_tpu.parallel.mesh import field_sharding, make_mesh

    D, N, P = BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
    mesh = make_mesh(1, 1)

    def cfg_for(nx, ny, bcs=None):
        cfg = bench_config(nx, ny, a.chunk)
        if bcs is not None:
            cfg.bc = BCConfig(*bcs)
        return cfg

    def rate(adv, u0, nx, ny):
        fn = aot_compile(adv(a.chunk), u0, label="hw_rates")
        best, _ = time_best_of(fn, u0, a.reps, a.trials)
        return nx * ny * a.chunk * a.reps / best / 1e9

    def single(cfg, dtype=jnp.float32):
        u = jax.device_put(gaussian_hotspot(cfg, dtype), jax.devices()[0])
        return rate(build_single_device_advance(cfg, cfg.dt), u, cfg.nx, cfg.ny)

    def sharded(cfg, builder, dtype=jnp.float32, **kw):
        adv = builder(cfg, mesh, cfg.dt, **kw)
        if adv is None:
            return None
        u = jax.device_put(gaussian_hotspot(cfg, dtype), field_sharding(mesh))
        if hasattr(adv, "embed"):
            u = adv.embed(jax.device_put(gaussian_hotspot(cfg, dtype)))
        return rate(adv, u, cfg.nx, cfg.ny)

    base_cfg = cfg_for(a.nx, a.ny)
    denom = single(base_cfg)
    print(f"single_mixed      {denom:7.1f} Gpt/s  (denominator; floor "
          f"{a.floor:.0f})", flush=True)
    failures = 0
    if denom < a.floor:
        print(f"FAIL single_mixed below absolute floor {a.floor}", flush=True)
        failures += 1

    checks = []

    def add(name, r, lo, hi):
        if r is None:
            print(f"SKIP {name:18s} (no layout for this shape)", flush=True)
            return
        ratio = r / denom
        ok = lo <= ratio <= hi
        print(f"{'ok  ' if ok else 'FAIL'} {name:18s} {r:7.1f} Gpt/s  "
              f"ratio={ratio:.3f}  band=[{lo},{hi}]", flush=True)
        checks.append(ok)

    add("single_torus", single(cfg_for(a.nx, a.ny, (P, P, P, P))),
        0.75, 1.40)
    add("single_bf16", single(base_cfg, jnp.bfloat16), 0.75, 1.40)
    add("slab_dirichlet",
        sharded(cfg_for(a.nx, a.ny, (D, D, D, D)),
                build_sharded_multistep_advance), 0.70, 1.30)
    add("slab_os_y",
        sharded(cfg_for(a.nx, a.ny, (D, N, P, D)),
                build_sharded_multistep_advance), 0.68, 1.30)
    add("carrier_4000_mixed",
        sharded(cfg_for(4000, 4000), build_carrier_slab_advance,
                dtype_name="float32"), 0.60, 1.30)
    # 2500^2 triggers the BY-friendliness height expansion (2504/BY 8 ->
    # 2520/BY 168): this row read 0.36x before the expansion landed —
    # the band also guards that feature
    add("carrier_2500_byexp",
        sharded(cfg_for(2500, 2500), build_carrier_slab_advance,
                dtype_name="float32"), 0.55, 1.30)
    add("overlap_mixed",
        sharded(base_cfg, build_sharded_overlap_advance), 0.35, 1.10)
    ps_cfg = base_cfg
    add("perstep",
        sharded(ps_cfg, lambda c, m, dt: build_sharded_advance(
            c, m, dt, make_interior_step(c, dt))), 0.07, 0.25)

    failures += sum(not ok for ok in checks)
    n = len(checks) + 1
    print(f"hw_rates: {n} checks: "
          f"{'ALL OK' if not failures else f'{failures} FAILURES'}",
          flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
