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

Feeding the measured L and the measured local per-step time into
``T_p = T_local + steps * rounds * L`` then PREDICTS the same-session
weak-efficiency CSVs — the validation recorded in docs/performance.md
("The latency model validated against measurement"): the r05 numbers
cross-check three ways (idle faces 0.67-0.73 ms/step, loaded variant
0.71, full-program ablation 1.9 at p=4), bracket the measured
latency-dominated 256²-tile CSV row, and show the 4096²-tile weak
inefficiency is DRAM contention + local assembly (measured by
``--platform=multiproc_nocomm`` and a ``_pshift``-identity ablation),
not exchange latency.

Method: each rank runs one jitted shard_map program of R chained
exchange iterations on face payloads of the requested tile; timing
R and 2R iterations and differencing cancels dispatch overhead:
``cost_per_iteration = (T(2R) - T(R)) / R``.  Faces are the width-1
tile faces (f32), so the bandwidth term is negligible and the number is
the platform's per-round LATENCY.  ``--load`` instead carries the tile
and runs a 5-point update per iteration (the driver's per-step
structure) — the exchange cost under full compute load.

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

    def one_iter(col, row, coll: bool):
        # The per-step exchange dataflow of exchange_and_pad at exactly
        # its payload shapes: round 1 = both x faces (concurrent,
        # (my, 1) payloads), round 2 = both FULL-WIDTH y rows ((1, mx+2)
        # payloads) that depend on round 1's result — the same x-then-y
        # chain as the production path.  Only the faces are loop state
        # (O(perimeter) compute per iteration), so the differencing
        # measures collective latency, not a full-tile stencil.
        # coll=False is the CONTROL: identical arithmetic, no permutes.
        def shift(face, axis_name, n, s):
            return _pshift(face, axis_name, n, s) if coll else face

        h = jnp.float32(0.5)
        gl = shift(col, "x", px, +1)
        gr = shift(col, "x", px, -1)
        col2 = h * (gl + gr)
        # corner cells of the y rows carry round-1 data (the x-extended
        # row of the real exchange) -> y permutes chain on the x round
        row_src = row.at[:, :1].set(col2[:1, :]).at[:, -1:].set(col2[-1:, :])
        gb = shift(row_src, "y", py, +1)
        gt = shift(row_src, "y", py, -1)
        return col2, h * (gb + gt)

    def one_iter_loaded(u, coll: bool):
        # LOADED variant (--load): the driver's actual per-step structure
        # — exchange the tile's own faces, then run an O(area) 5-point
        # update consuming the ghosts.  With every core pinned and busy,
        # the collective's progress machinery competes with compute, so
        # the differenced cost is the exchange cost UNDER LOAD — the
        # number the per-step path actually pays (idle-network latency
        # from the face-only variant understates it on this platform;
        # both are reported in docs/performance.md).
        def shift(face, axis_name, n, s):
            return _pshift(face, axis_name, n, s) if coll else face

        gl = shift(u[:, -1:], "x", px, +1)
        gr = shift(u[:, :1], "x", px, -1)
        mid = jnp.concatenate([gl, u, gr], axis=1)
        gb = shift(mid[-1:, :], "y", py, +1)
        gt = shift(mid[:1, :], "y", py, -1)
        full = jnp.concatenate([gb, mid, gt], axis=0)
        c = full[1:-1, 1:-1]
        return jnp.float32(0.2) * (
            c + full[:-2, 1:-1] + full[2:, 1:-1]
            + full[1:-1, :-2] + full[1:-1, 2:]
        )

    def loop(n, coll: bool):
        if a.load:
            def body(u):
                return lax.fori_loop(
                    0, n, lambda i, v: one_iter_loaded(v, coll), u
                )

            return jax.jit(jax.shard_map(
                body, mesh=mesh,
                in_specs=PartitionSpec("y", "x"),
                out_specs=PartitionSpec("y", "x"),
            ))

        def body(col, row):
            return lax.fori_loop(
                0, n, lambda i, s: one_iter(*s, coll), (col, row)
            )

        return jax.jit(jax.shard_map(
            body, mesh=mesh,
            in_specs=(PartitionSpec("y", "x"), PartitionSpec("y", "x")),
            out_specs=(PartitionSpec("y", "x"), PartitionSpec("y", "x")),
        ))

    spec = NamedSharding(mesh, PartitionSpec("y", "x"))
    import numpy as np

    if a.load:
        args = (jax.device_put(
            jnp.ones((my * py, mx * px), jnp.float32), spec
        ),)
    else:
        # global faces: per-shard (my, 1) columns and (1, mx+2) rows
        args = (
            jax.device_put(jnp.ones((my * py, px), jnp.float32), spec),
            jax.device_put(
                jnp.ones((py, (mx + 2) * px), jnp.float32), spec
            ),
        )

    def fetch(out):
        for o in (out if isinstance(out, tuple) else (out,)):
            np.asarray(o.addressable_shards[0].data)

    fns = {
        (n, c): loop(n, c)
        for n in (a.iters, 2 * a.iters) for c in (True, False)
    }
    for fn in fns.values():  # compile + warm outside timing
        fetch(fn(*args))

    def timed(n, coll):
        best = float("inf")
        for _ in range(a.trials):
            t0 = time.perf_counter()
            fetch(fns[(n, coll)](*args))
            best = min(best, time.perf_counter() - t0)
        return best

    # (T(2R) - T(R)) / R cancels dispatch overhead; the coll=False
    # control (same arithmetic, local slices) isolates the collectives.
    t = {
        (n, c): timed(n, c)
        for n in (a.iters, 2 * a.iters) for c in (True, False)
    }
    e_coll = (t[(2 * a.iters, True)] - t[(a.iters, True)]) / a.iters
    e_ctrl = (t[(2 * a.iters, False)] - t[(a.iters, False)]) / a.iters
    e = e_coll - e_ctrl
    rounds = (1 if px > 1 else 0) + (1 if py > 1 else 0)
    if a.worker == 0:
        print(json.dumps({
            "ranks": a.ranks, "mesh": [py, px], "tile": a.tile,
            "iters": a.iters, "load": bool(a.load),
            "raw_s": {f"{'coll' if c else 'ctrl'}_{n}": round(v, 6)
                      for (n, c), v in t.items()},
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
    ap.add_argument("--load", action="store_true",
                    help="loaded variant: exchange the tile's own faces "
                         "and run an O(area) 5-point update per iteration "
                         "(the driver's per-step structure) — measures "
                         "the exchange cost UNDER compute load")
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
               f"--trials={a.trials}", f"--worker={i}", f"--port={port}"]
            + (["--load"] if a.load else []),
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
