#!/usr/bin/env python3
"""Device-side sustained throughput from a profiler trace.

Wall-clock timing through the tunneled TPU absorbs a fixed ~65 ms
synchronization cost per fetch, which distorts cross-size comparisons
(docs/performance.md, "Measuring through the tunnel").  This tool times the
kernel where it runs: capture a `jax.profiler` trace around a few chained
chunk dispatches, then read the per-chunk execution span and inter-chunk
gaps straight from the device timeline (Perfetto JSON).

Usage:
    python scripts/trace_rate.py --nx 4096 --ny 4096 [--chunk 100 --reps 3]
Prints one line per metric: ms/chunk, device Gpoint/s, max inter-chunk gap.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
# Importable when invoked as `python scripts/<name>.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))



def capture(nx: int, ny: int, chunk: int, reps: int, outdir: str,
            bc: str = "bench") -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from climate_sim_tpu.benchproto import bench_config, sync_fetch
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import build_single_device_advance

    cfg = bench_config(nx, ny, chunk)
    if bc != "bench" and not bc.startswith("carrier"):
        from climate_sim_tpu.config import BCConfig, BCType

        D, N, P = BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
        cfg.bc = BCConfig(*{
            "dirichlet": (D, D, D, D),
            "torus": (P, P, P, P),
            "one_sided_y": (D, N, P, D),
            "one_sided_x": (P, D, N, D),
            "both_one_sided": (P, D, P, N),
        }[bc])
    if bc.startswith("carrier"):
        # carrier path on a 1x1 mesh (misaligned grids); bc "carrier" =
        # mixed D/N, "carrier_torus" = periodic^4
        from climate_sim_tpu.config import BCConfig, BCType
        from climate_sim_tpu.parallel.halo import build_carrier_slab_advance
        from climate_sim_tpu.parallel.mesh import make_mesh

        D, N, P = BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC
        cfg.bc = BCConfig(*((P, P, P, P) if bc == "carrier_torus"
                            else (D, N, D, N)))
        adv = build_carrier_slab_advance(cfg, make_mesh(1, 1), cfg.dt)
        if adv is None:
            raise SystemExit(f"carrier unavailable for {nx}x{ny}")
        fn = adv(chunk)
        u = adv.embed(gaussian_hotspot(cfg, jnp.float32))
    else:
        fn = build_single_device_advance(cfg, cfg.dt)(chunk)
        u = jax.device_put(gaussian_hotspot(cfg, jnp.float32), jax.devices()[0])
    fn = fn.lower(u).compile()  # traces must cover only the compiled program
    u = fn(u)
    sync_fetch(u)  # flush the deferred remote compile before tracing

    jax.profiler.start_trace(outdir)
    for _ in range(reps):
        u = fn(u)
    sync_fetch(u)
    jax.profiler.stop_trace()


def analyze(outdir: str, nx: int, ny: int, chunk: int):
    paths = glob.glob(os.path.join(outdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no Perfetto trace under {outdir}")
    with gzip.open(sorted(paths)[-1]) as f:
        tr = json.load(f)
    ev = [e for e in tr["traceEvents"]
          if e.get("ph") == "X" and str(e.get("name", "")).startswith("jit_")
          and e.get("dur", 0) > 100]
    # Keep only the top-level jitted step program (longest-duration name
    # group) on the device lane.
    by_name = {}
    for e in ev:
        by_name.setdefault(e["name"], []).append(e)
    name, evs = max(by_name.items(), key=lambda kv: sum(e["dur"] for e in kv[1]))
    evs.sort(key=lambda e: e["ts"])
    per_chunk_us = sum(e["dur"] for e in evs) / len(evs)
    gaps = [b["ts"] - (a["ts"] + a["dur"]) for a, b in zip(evs, evs[1:])]
    rate = nx * ny * chunk / (per_chunk_us / 1e6)
    return {
        "program": name,
        "n_chunks": len(evs),
        "ms_per_chunk": per_chunk_us / 1e3,
        "device_gpts": rate / 1e9,
        "max_gap_ms": (max(gaps) / 1e3) if gaps else 0.0,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--nx", type=int, default=4096)
    ap.add_argument("--ny", type=int, default=4096)
    ap.add_argument("--chunk", type=int, default=100)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace_dir", default=None,
                    help="keep the trace here (default: temp dir)")
    ap.add_argument("--analyze_only", default=None,
                    help="skip capture; analyze this existing trace dir")
    ap.add_argument("--bc", default="bench",
                    choices=["bench", "dirichlet", "torus", "one_sided_y",
                             "one_sided_x", "both_one_sided",
                             "carrier", "carrier_torus"],
                    help="BC class (the one-sided classes trace the "
                         "wrap-consumer-patch paths)")
    a = ap.parse_args()

    outdir = a.analyze_only or a.trace_dir or tempfile.mkdtemp(prefix="tracerate_")
    if not a.analyze_only:
        capture(a.nx, a.ny, a.chunk, a.reps, outdir, a.bc)
    r = analyze(outdir, a.nx, a.ny, a.chunk)
    print(f"program: {r['program']}  chunks: {r['n_chunks']}")
    print(f"ms/chunk({a.chunk} steps): {r['ms_per_chunk']:.3f}")
    print(f"device rate: {r['device_gpts']:.1f} Gpoint/s")
    print(f"max inter-chunk gap: {r['max_gap_ms']:.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
