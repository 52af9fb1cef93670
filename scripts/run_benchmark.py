#!/usr/bin/env python3
"""Strong/weak scaling benchmark harness.

Mirrors the reference's ``scripts/run_benchmark.sh`` protocol and CSV schema
(reference: run_benchmark.sh:31-91): strong scaling on a fixed grid over a
rank sweep, weak scaling with a fixed per-rank tile, speedup S=T1/Tp,
efficiency E=S/p and Karp-Flatt (1/S-1/p)/(1-1/p) annotations.

Where the reference launches ``mpirun [--oversubscribe] -np p``, this
harness launches one subprocess per measurement with a *virtual CPU device
mesh* (``--xla_force_host_platform_device_count=p`` — the JAX analogue of
oversubscribed local ranks), each parsing the driver's greppable
``timing: total_max=... worst_avg_step=...`` line (driver.py prints it for
exactly this purpose, like main.cpp:127-133).

``--platform=tpu`` instead runs on the attached TPU chips (rank counts are
then capped at the real device count).

Outputs (same filenames/columns as the reference):
    bench/results/strong_<ts>.csv
    bench/results/strong_annotated_<ts>.csv
    bench/results/weak_<ts>.csv
"""

from __future__ import annotations

import argparse
import datetime
import math
import os
import re
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_TIMING_RE = re.compile(r"timing: total_max=([0-9.eE+-]+)")


def run_one(p: int, nx: int, ny: int, steps: int, platform: str,
            extra: list[str]) -> tuple[float, float]:
    """One measurement subprocess -> (total_time, perstep_time)."""
    env = dict(os.environ)
    args = [
        sys.executable, "-m", "climate_sim_tpu",
        f"--nx={nx}", f"--ny={ny}", f"--steps={steps}",
        "--out_every=1000000",  # timing runs write no mid-run snapshots
        "--output.enable=false",
    ] + extra
    if platform == "cpu":
        env["CLIMATE_SIM_PLATFORM"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "") + f" --xla_force_host_platform_device_count={p}"
        )
    else:
        # Real chips: cap the device count per measurement, else every row
        # would silently use all attached chips.
        args.append(f"--max_devices={p}")
    out = subprocess.run(
        args, cwd=REPO_ROOT, env=env, capture_output=True, text=True, timeout=1800
    )
    if out.returncode != 0:
        raise RuntimeError(
            f"run p={p} nx={nx} ny={ny} failed (exit {out.returncode}):\n{out.stderr[-2000:]}"
        )
    m = _TIMING_RE.search(out.stdout)
    if not m:
        raise RuntimeError(f"no timing line in output:\n{out.stdout[-2000:]}")
    total = float(m.group(1))
    return total, total / steps


def annotate_strong(rows: list[tuple]) -> list[tuple]:
    t1 = rows[0][4]
    ann = []
    for (p, nx, ny, steps, total, perstep) in rows:
        s = t1 / total if total > 0 else 0.0
        e = s / p if p else 0.0
        kf = ((1.0 / s - 1.0 / p) / (1.0 - 1.0 / p)) if (p > 1 and s > 0) else 0.0
        ann.append((p, nx, ny, steps, total, perstep, s, e, kf))
    return ann


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu",
                    help="cpu = virtual device mesh (default, like mpirun "
                         "--oversubscribe); tpu = real attached chips")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--strong-nx", type=int, default=1024)
    ap.add_argument("--strong-ny", type=int, default=1024)
    ap.add_argument("--strong-ranks", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--weak-tile-nx", type=int, default=256)
    ap.add_argument("--weak-tile-ny", type=int, default=256)
    ap.add_argument("--weak-ranks", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--out-dir", default=os.path.join(REPO_ROOT, "bench", "results"))
    ap.add_argument("--skip-weak", action="store_true")
    args, extra = ap.parse_known_args()
    # Unrecognized --key=value tokens pass through to the simulation CLI.
    args.extra = extra

    if args.platform == "tpu":
        import jax  # noqa: deferred so cpu mode never inits a backend here

        n = len(jax.devices())
        args.strong_ranks = sorted({min(p, n) for p in args.strong_ranks})
        args.weak_ranks = sorted({min(p, n) for p in args.weak_ranks})

    os.makedirs(args.out_dir, exist_ok=True)
    ts = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
    strong_csv = os.path.join(args.out_dir, f"strong_{ts}.csv")
    strong_annot = os.path.join(args.out_dir, f"strong_annotated_{ts}.csv")
    weak_csv = os.path.join(args.out_dir, f"weak_{ts}.csv")

    header = "ranks,nx,ny,steps,total_time,perstep_time"

    rows = []
    for p in args.strong_ranks:
        print(f"== strong: p={p} ==", flush=True)
        total, perstep = run_one(
            p, args.strong_nx, args.strong_ny, args.steps, args.platform, args.extra
        )
        rows.append((p, args.strong_nx, args.strong_ny, args.steps, total, perstep))
    with open(strong_csv, "w") as f:
        f.write(f"# strong scaling: Nx={args.strong_nx}, Ny={args.strong_ny}, "
                f"steps={args.steps}\n{header}\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    with open(strong_annot, "w") as f:
        f.write(f"# strong scaling: Nx={args.strong_nx}, Ny={args.strong_ny}, "
                f"steps={args.steps}\n{header},speedup,efficiency,karp_flatt\n")
        for r in annotate_strong(rows):
            f.write(",".join(str(v) for v in r) + "\n")
    print(f"Annotated strong-scaling results written to {strong_annot}")

    if not args.skip_weak:
        with open(weak_csv, "w") as f:
            f.write(f"# weak scaling: tile={args.weak_tile_nx}x{args.weak_tile_ny}, "
                    f"steps={args.steps}\n{header}\n")
            for p in args.weak_ranks:
                k = math.ceil(math.sqrt(p))
                nx, ny = args.weak_tile_nx * k, args.weak_tile_ny * k
                print(f"== weak: p={p}, Nx={nx}, Ny={ny} ==", flush=True)
                total, perstep = run_one(p, nx, ny, args.steps, args.platform, args.extra)
                f.write(f"{p},{nx},{ny},{args.steps},{total},{perstep}\n")

    print(f"\nWrote:\n  {strong_csv}\n  {strong_annot}")
    if not args.skip_weak:
        print(f"  {weak_csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
