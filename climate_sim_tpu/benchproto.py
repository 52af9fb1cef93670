"""Single-source benchmark measurement protocol.

The canonical workload + timing dance shared by ``bench.py`` (the headline),
``scripts/perf_sweep.py``, ``scripts/sharded_path_bench.py`` and
``scripts/trace_rate.py`` — so a protocol change (sync idiom, BC set,
physics) lands in exactly one place.  The protocol itself is documented in
docs/performance.md ("Measuring through the tunnel"): AOT-compile outside
the timed region, force materialization with a scalar fetch (through the
tunneled TPU, compilation is deferred to the first data fetch and
``block_until_ready`` does not cover it), then time REPS chained chunk
dispatches per sync and keep the best of N trials.
"""

from __future__ import annotations

import sys
import time
from typing import Callable, Tuple

import numpy as np


def bench_config(nx: int, ny: int, chunk: int):
    """The canonical benchmark workload: diffusion+advection with mixed BCs
    (all three BC kinds exercised; matches BASELINE.json config #3)."""
    from .config import BCConfig, BCType, SimConfig

    cfg = SimConfig(nx=nx, ny=ny, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                    steps=chunk, out_every=chunk)
    cfg.bc = BCConfig(left=BCType.DIRICHLET, right=BCType.NEUMANN,
                      bottom=BCType.PERIODIC, top=BCType.PERIODIC)
    return cfg


def auto_reps(nx: int, ny: int, chunk: int,
              window_points: int = 200_000_000_000) -> int:
    """Chained chunks per sync for a ~1 s device window at the ~200 Gpt/s
    class rate — the window-matched protocol (fixed-reps timing
    under-reads by the per-sync tax's relative weight, 10-25% at small
    grids; docs/performance.md "Measuring through the tunnel").  Single
    source of truth for carrier_bench/sharded_path_bench."""
    return max(3, -(-window_points // (nx * ny * chunk)))


def aot_compile(fn, u, label: str = "bench"):
    """Lower+compile ahead of time; on failure warn and return ``fn`` (jit
    path) so the measurement still runs."""
    try:
        return fn.lower(u).compile()
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"[{label}] AOT compile failed ({e}); falling back to jit",
              file=sys.stderr)
        return fn


def sync_fetch(u) -> None:
    """Hard synchronization that also forces any deferred remote compile:
    block, then fetch one scalar through the transfer path."""
    u.block_until_ready()
    import jax

    np.asarray(jax.device_get(u[:1, :1]))


def time_best_of(fn: Callable, u, reps: int, trials: int) -> Tuple[float, object]:
    """Warm up once (with a sync), then time ``reps`` chained dispatches per
    trial; returns ``(best_seconds, final_u)``.  Best-of-N because per-trial
    variance through the tunnel is a few percent and the minimum is the
    honest estimate of the sustained device rate."""
    u = fn(u)
    sync_fetch(u)
    best = float("inf")
    for _trial in range(trials):
        t0 = time.perf_counter()
        for _ in range(reps):
            u = fn(u)
        sync_fetch(u)
        best = min(best, time.perf_counter() - t0)
    return best, u
