#!/usr/bin/env python3
"""Hardware conformance sweep: every kernel path x BC class on the real chip.

CPU interpret-mode tests cannot catch Mosaic lowering/layout bugs, so this
runs the full path matrix on actual TPU hardware and compares each result
against the float64 CPU oracle computed in-process:

  paths:  single-device fused multi-step | sharded slab (1x1 mesh) |
          sharded overlap | sharded per-step fallback |
          padded-carrier (engages on grids with no aligned tiles)
  BCs:    all-dirichlet | all-neumann | torus | mixed |
          one-sided-y (ghost-row schedule) |
          one-sided-x (transpose / ghost-column schedule) |
          both-axes one-sided (row + column schedules + corner patch,
          both corner orientations) | reference-compat
  plus a non-128-multiple grid (assembled fallback + carrier) and two
  indivisible carrier grids (one exercising periodic pad staging).

Prints one line per (case, path) and a final summary WITH THE EXECUTED
CASE COUNT — quote that emitted number, do not hand-count the matrix.
Exits nonzero on any mismatch.  Runtime: ~2-5 min through the tunneled
TPU (compiles dominate).

Usage:  python scripts/hw_conformance.py [--nx 512 --ny 256 --steps 16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nx", type=int, default=512)
    ap.add_argument("--ny", type=int, default=256)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--tol", type=float, default=5e-5)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from climate_sim_tpu.config import BCConfig, BCType, SimConfig
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import build_single_device_advance, reference_step
    from climate_sim_tpu.parallel.halo import (
        build_sharded_advance,
        build_sharded_multistep_advance,
        build_sharded_overlap_advance,
    )
    from climate_sim_tpu.ops.step import make_interior_step
    from climate_sim_tpu.parallel.mesh import field_sharding, make_mesh

    if jax.devices()[0].platform == "cpu":
        print("[hw_conformance] WARNING: running on CPU — this validates "
              "interpret mode, not Mosaic lowering", file=sys.stderr)

    D, N, P = BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
    BCS = {
        "dirichlet4": (D, D, D, D),
        "neumann4": (N, N, N, N),
        "torus": (P, P, P, P),
        "mixed": (D, N, P, P),
        "one_sided_y": (P, P, P, D),
        "one_sided_x": (P, D, N, D),
        # all four corner orientations: the wrap consumer patches differ
        # per side (which roll operand is patched, and with which BC), so
        # every pair must lower on hardware
        "both_os_lb": (P, D, P, N),
        "both_os_rt": (D, P, N, P),
        "both_os_lt": (P, N, D, P),
        "both_os_rb": (N, P, P, D),
    }

    def cfg_for(bcs, nx, ny, compat=False):
        cfg = SimConfig(nx=nx, ny=ny, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                        steps=args.steps, out_every=args.steps)
        cfg.bc = BCConfig(*bcs)
        cfg.strict_reference_compat = compat
        return cfg

    def oracle(u, cfg):
        r = u
        for _ in range(args.steps):
            r = reference_step(r, cfg, cfg.dt)
        return np.asarray(r, np.float64)

    from climate_sim_tpu.parallel.halo import build_carrier_slab_advance

    mesh = make_mesh(1, 1)
    failures = 0
    rows = 0
    cases = [(name, bcs, args.nx, args.ny, False) for name, bcs in BCS.items()]
    cases.append(("compat_mixed", BCS["mixed"], args.nx, args.ny, True))
    cases.append(("odd_grid_mixed", BCS["mixed"], 120, 72, False))
    # Indivisible carrier grids: misaligned x (pad to 1024); the torus one
    # exercises the periodic wrap-head/tail-mirror pad staging on hardware.
    cases.append(("carrier_mixed", BCS["mixed"], 1000, 504, False))
    cases.append(("carrier_torus", BCS["torus"], 1000, 504, False))
    # Deep passes (steps_per_pass=16): 16-wide slabs/halos must lower too.
    cases.append(("k16_mixed", BCS["mixed"], 1024, 512, "k16"))
    # Past the buffer-width locality knee (W>5120): the chain-geometry
    # scorer picks the intermediate BX=3072 candidate — that multi-block
    # padded layout must lower and match on hardware too.
    cases.append(("wide_knee_mixed", BCS["mixed"], 6144, 256, False))
    # ONE-SIDED periodic x indivisible grids: the carrier's in-kernel
    # wrap-block consumer patches (the previously-rejected envelope cell).
    cases.append(("carrier_os_y", (D, N, P, D), 1000, 504, False))
    cases.append(("carrier_os_x", (D, P, N, D), 1000, 504, False))
    # bf16 STORAGE mode (f32 in-kernel arithmetic, one rounding per pass):
    # 16-sublane tiles, khalo=16 — must lower on hardware; tolerance is
    # bf16-rounding class (~2^-8 per pass + the IC cast), not f32's.
    cases.append(("bf16_mixed", BCS["mixed"], args.nx, args.ny, "bf16"))
    cases.append(("bf16_dirichlet4", BCS["dirichlet4"], args.nx, args.ny, "bf16"))
    # bf16 x ONE-SIDED periodic: the wrap consumer patches inside the
    # bf16 chained build (16-sublane tiles) must lower and match too.
    cases.append(("bf16_os_y", (D, N, P, D), args.nx, args.ny, "bf16"))
    # BY-friendliness height expansion (r05): ny=1252 -> carrier height
    # 1280 (the minimal 1256 = 8x313 has only divisor 8) — the expanded
    # geometry's runtime edge rows/selects must lower and match on
    # hardware; torus variant exercises staging at an expanded height.
    cases.append(("carrier_byexp", BCS["mixed"], 1000, 1252, False))
    cases.append(("carrier_byexp_t", BCS["torus"], 1000, 1252, False))
    # bf16 x CARRIER (r05): 16-row staging depth / alignment quantum —
    # the bf16 carrier build must lower and match on hardware (storage
    # tolerance); the misaligned grid also engages the single-device
    # assembled fallback chain under bf16.
    cases.append(("bf16_carrier", BCS["mixed"], 1000, 504, "bf16"))

    for name, bcs, nx, ny, compat in cases:
        k16 = compat == "k16"
        bf16 = compat == "bf16"
        compat = False if (k16 or bf16) else compat
        cfg = cfg_for(bcs, nx, ny, compat)
        if k16:
            cfg.steps_per_pass = 16
        u = gaussian_hotspot(cfg, jnp.float32)
        # park mass against edges so edge handling is visible
        u = u + 0.4 * jnp.roll(u, ny // 2 - 2, 0) + 0.4 * jnp.roll(u, nx // 2 - 2, 1)
        dtype_name = "float32"
        tol = args.tol
        if bf16:
            u = u.astype(jnp.bfloat16)  # the oracle sees the same cast IC
            dtype_name = "bfloat16"
            # Storage-mode paths round once per pass (measured ~3e-3 at
            # 16 steps); the per-step fallback rounds every step —
            # worst-case ~steps * 2^-9 * scale ≈ 3e-2 at 16 steps
            # (measured 2.9e-2).  One tolerance covers the whole path
            # matrix; the tight per-pass bound is asserted in
            # tests/test_pallas.py.
            tol = 4e-2
        ref = oracle(jnp.asarray(u, jnp.float64), cfg)
        scale = max(1.0, np.abs(ref).max())

        runs = {"single": lambda: build_single_device_advance(cfg, cfg.dt)(args.steps)(
            jax.device_put(u))}
        us = jax.device_put(u, field_sharding(mesh))
        adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, dtype_name=dtype_name)
        if adv is not None:
            runs["sharded_multistep"] = lambda adv=adv: adv(args.steps)(us)
        runs["sharded_perstep"] = lambda: build_sharded_advance(
            cfg, mesh, cfg.dt, make_interior_step(cfg, cfg.dt))(args.steps)(us)
        ov = build_sharded_overlap_advance(cfg, mesh, cfg.dt, dtype_name=dtype_name)
        if ov is not None:
            runs["sharded_overlap"] = lambda ov=ov: ov(args.steps)(us)
        car = build_carrier_slab_advance(cfg, mesh, cfg.dt, dtype_name=dtype_name)
        if car is not None:
            runs["carrier"] = lambda car=car: car.extract(
                car(args.steps)(car.embed(jax.device_put(u)))
            )

        for path, fn in runs.items():
            try:
                out = np.asarray(jax.device_get(fn()), np.float64)
                err = np.abs(out - ref).max() / scale
                ok = np.isfinite(err) and err <= tol
            except Exception as e:  # pragma: no cover - hardware-dependent
                err, ok = float("nan"), False
                print(f"EXC  {name:16s} {path:18s} {e}", file=sys.stderr)
            status = "ok  " if ok else "FAIL"
            print(f"{status} {name:16s} {path:18s} rel_err={err:.2e}")
            rows += 1
            failures += 0 if ok else 1

    print(f"hw_conformance: {rows} cases: "
          f"{'ALL OK' if not failures else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
