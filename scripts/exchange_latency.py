#!/usr/bin/env python3
"""Per-exchange-round latency of the multiproc platform, measured directly.

The weak-scaling latency model (docs/performance.md "Weak scaling bounded
by LATENCY") predicts efficiency from TWO numbers: the per-pass compute
time and the per-exchange-round latency L, serialized ``slope`` times per
pass (slope = 2 structurally, `parallel/analysis.py`).  The model's L for
TPU meshes (ICI ~1.5 us, DCN 25-100 us) comes from public hardware
figures; this script closes the loop for the one platform we can measure
end-to-end — ``run_benchmark.py --platform=multiproc`` (p coordinated
jax.distributed CPU processes over TCP loopback) — by timing the ACTUAL
per-step exchange dataflow (the concurrent face ppermutes of
``parallel/halo.exchange_and_pad``: one round on a 1D mesh, two chained
rounds on a 2D mesh) in isolation.

Feeding the measured L and the measured p=1 per-step compute into
``eff = T1 / (T1 + steps * rounds * L)`` must then PREDICT the
weak-efficiency CSV of the same session — that is the validation
recorded in docs/performance.md (predicted-vs-measured table).

Method: each rank runs one jitted shard_map program of R chained
exchange iterations on face payloads of the requested tile; timing
R and 2R iterations and differencing cancels dispatch overhead:
``cost_per_iteration = (T(2R) - T(R)) / R``.  Faces are the width-1
tile faces (f32), so the bandwidth term is negligible and the number is
the platform's per-round LATENCY.

Usage (parent, spawns itself):
  python scripts/exchange_latency.py --ranks 2 --mesh-y 1 --tile 4096
  python scripts/exchange_latency.py --ranks 4 --mesh-y 2 --tile 4096
Prints one JSON line: {"ranks": p, "mesh": [py, px], "rounds_per_iter":
d, "iter_cost_s": e, "per_round_s": e/d, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def worker(a) -> int:
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{a.port}",
        num_processes=a.ranks,
        process_id=a.worker,
    )
    import time

    import jax.numpy as jnp
    from jax import lax
    from jax.sharding import NamedSharding, PartitionSpec

    from climate_sim_tpu.parallel.halo import _pshift
    from climate_sim_tpu.parallel.mesh import make_mesh

    py = a.mesh_y
    px = a.ranks // py
    mesh = make_mesh(px, py)
    my, mx = a.tile, a.tile

    def one_iter(u, coll: bool):
        # the per-step exchange dataflow of exchange_and_pad: round 1 =
        # both x faces (concurrent), round 2 = both full-width y faces
        # (they consume the x-extended rows -> chained).  Size-1 axes
        # skip their round, exactly like the production path.  coll=False
        # is the CONTROL: identical arithmetic, local slices instead of
        # ppermutes — differencing isolates the collective cost.
        def shift(face, axis_name, n, s):
            return _pshift(face, axis_name, n, s) if coll else face

        gl = shift(u[:, -1:], "x", px, +1)
        gr = shift(u[:, :1], "x", px, -1)
        mid = jnp.concatenate([gl, u, gr], axis=1)
        gb = shift(mid[-1:, :], "y", py, +1)
        gt = shift(mid[:1, :], "y", py, -1)
        full = jnp.concatenate([gb, mid, gt], axis=0)
        # consume EVERY ghost (5-point average standing in for the
        # stencil's ghost reads) so no permute is dead code — slicing the
        # ghosts back off would let XLA delete the collectives outright.
        c = full[1:-1, 1:-1]
        return jnp.float32(0.2) * (
            c + full[:-2, 1:-1] + full[2:, 1:-1]
            + full[1:-1, :-2] + full[1:-1, 2:]
        )

    def loop(n, coll: bool):
        def body(u_local):
            return lax.fori_loop(
                0, n, lambda i, v: one_iter(v, coll), u_local
            )

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=PartitionSpec("y", "x"),
            out_specs=PartitionSpec("y", "x"),
        ))

    spec = NamedSharding(mesh, PartitionSpec("y", "x"))
    gy, gx = my * py, mx * px
    u = jax.device_put(jnp.ones((gy, gx), jnp.float32), spec)
    import numpy as np

    fns = {
        (n, c): loop(n, c)
        for n in (a.iters, 2 * a.iters) for c in (True, False)
    }
    for fn in fns.values():  # compile + warm outside timing
        np.asarray(fn(u).addressable_shards[0].data)

    def timed(n, coll):
        best = float("inf")
        for _ in range(a.trials):
            t0 = time.perf_counter()
            np.asarray(fns[(n, coll)](u).addressable_shards[0].data)
            best = min(best, time.perf_counter() - t0)
        return best

    # (T(2R) - T(R)) / R cancels dispatch overhead; the coll=False
    # control (same arithmetic, local slices) isolates the collectives.
    e_coll = (timed(2 * a.iters, True) - timed(a.iters, True)) / a.iters
    e_ctrl = (timed(2 * a.iters, False) - timed(a.iters, False)) / a.iters
    e = e_coll - e_ctrl
    rounds = (1 if px > 1 else 0) + (1 if py > 1 else 0)
    if a.worker == 0:
        print(json.dumps({
            "ranks": a.ranks, "mesh": [py, px], "tile": a.tile,
            "iters": a.iters,
            "iter_cost_coll_s": round(e_coll, 9),
            "iter_cost_ctrl_s": round(e_ctrl, 9),
            "exchange_cost_per_iter_s": round(e, 9),
            "rounds_per_iter": rounds,
            "per_round_s": round(e / max(1, rounds), 9),
        }), flush=True)
    return 0


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ranks", type=int, default=2)
    ap.add_argument("--mesh-y", type=int, default=1,
                    help="py; px = ranks//py (1D x-mesh by default)")
    ap.add_argument("--tile", type=int, default=4096,
                    help="per-rank tile extent (faces are width-1)")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--worker", type=int, default=-1, help=argparse.SUPPRESS)
    ap.add_argument("--port", type=int, default=0, help=argparse.SUPPRESS)
    a = ap.parse_args()
    if a.ranks % a.mesh_y:
        ap.error("--mesh-y must divide --ranks")
    if a.worker >= 0:
        return worker(a)

    import shutil
    import socket
    import tempfile

    s = socket.socket()
    s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ)
    # same per-rank pinning as run_benchmark.py multiproc: 1 virtual CPU
    # device and 1 core per rank
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=1"
        + " --xla_cpu_multi_thread_eigen=false"
        + " intra_op_parallelism_threads=1"
    )
    env["OMP_NUM_THREADS"] = "1"
    pin = shutil.which("taskset") is not None
    ncores = os.cpu_count() or 1
    outfiles = [tempfile.TemporaryFile(mode="w+") for _ in range(a.ranks)]
    procs = [
        subprocess.Popen(
            (["taskset", "-c", str(i % ncores)] if pin else [])
            + [sys.executable, os.path.abspath(__file__),
               f"--ranks={a.ranks}", f"--mesh-y={a.mesh_y}",
               f"--tile={a.tile}", f"--iters={a.iters}",
               f"--trials={a.trials}", f"--worker={i}", f"--port={port}"],
            cwd=REPO, env=env, stdout=outfiles[i],
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(a.ranks)
    ]
    try:
        for p in procs:
            p.wait(timeout=900)
    except subprocess.TimeoutExpired:
        for p in procs:  # exact PIDs only, never by pattern
            if p.poll() is None:
                p.kill()
        for p in procs:
            p.wait()
        raise
    fail = False
    for i, (p, f) in enumerate(zip(procs, outfiles)):
        f.seek(0)
        out = f.read()
        f.close()
        if p.returncode != 0:
            print(f"rank {i} failed (exit {p.returncode}):\n{out[-2000:]}",
                  file=sys.stderr)
            fail = True
        elif i == 0:
            sys.stdout.write(out)
    return 1 if fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
