"""Headline benchmark: grid-points/s/chip on the 4096^2 diffusion+advection
fused step (BASELINE.json metric).

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": "points/s", "vs_baseline": N}

``vs_baseline``: the reference publishes no numbers (BASELINE.md), so the
baseline is the per-chip HBM roofline for this memory-bound stencil:
one f32 read + one f32 write per point per step (neighbors hit on-chip) =
8 bytes/point over the chip's HBM bandwidth.  vs_baseline = value / roofline,
i.e. the fraction of speed-of-light achieved (target >= 0.9).

Timing notes (see .claude/skills/verify/SKILL.md): through the tunneled TPU,
compilation is deferred to the first fetch, so we AOT-compile and synchronize
with an explicit device_get before and after the timed section.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# Per-chip HBM bandwidth (bytes/s) by device kind; conservative public specs.
_HBM_BW = {
    "TPU v5 lite": 819e9,   # v5e: 819 GB/s
    "TPU v5e": 819e9,
    "TPU v4": 1228e9,
    "TPU v5p": 2765e9,
    "TPU v6 lite": 1640e9,  # v6e
}


def main() -> int:
    import jax
    import jax.numpy as jnp

    from climate_sim_tpu.benchproto import aot_compile, bench_config, time_best_of
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import build_single_device_advance, select_kernel

    NX = NY = 4096
    CHUNK = 100         # steps per dispatched program
    REPS = 600          # timed chunks -> 60000 steps per trial
    # REPS sizing: through the tunneled TPU, the end-of-trial sync
    # (block_until_ready + a scalar fetch) costs a fixed ~65 ms regardless
    # of work; profiler traces show chained chunk executions run
    # back-to-back on device (~14 us gaps).  60000 steps/trial (~4.4 s
    # device time at the measured rate) amortizes the sync to ~1%, so the
    # wall-clock rate converges on the device's sustained 229.6 Gpt/s —
    # the number a non-tunneled deployment would see.  Same-session
    # ladder (r05): REPS 200/400/600 -> 220.8/225.0/226.3 Gpt/s.  (At
    # the original REPS=10, the sync was ~38% of the trial and the
    # headline underread by a third.)

    cfg = bench_config(NX, NY, CHUNK)

    dev = jax.devices()[0]
    n_chips = len(jax.devices())
    print(f"[bench] device={dev.device_kind} n={n_chips} kernel={select_kernel(cfg)}",
          file=sys.stderr)

    advance = build_single_device_advance(cfg, cfg.dt)
    u = jax.device_put(gaussian_hotspot(cfg, jnp.float32), dev)
    fn = aot_compile(advance(CHUNK), u)

    best, _u = time_best_of(fn, u, REPS, trials=3)

    steps = REPS * CHUNK
    pts_per_s = NX * NY * steps / best
    bw = _HBM_BW.get(dev.device_kind)
    if bw is None:
        bw = 819e9
        print(f"[bench] WARNING: unknown device kind {dev.device_kind!r}; "
              f"vs_baseline uses the TPU v5e roofline ({bw/1e9:.0f} GB/s) "
              "and may be wrong", file=sys.stderr)
    roofline = bw / 8.0  # 8 bytes/point/step (f32 read+write)
    result = {
        "metric": "grid_points_per_s_per_chip_4096sq_diffadv",
        "value": round(pts_per_s, 1),
        "unit": "points/s",
        "vs_baseline": round(pts_per_s / roofline, 4),
    }
    print(f"[bench] {steps} steps in {best:.4f}s (best of 3) -> {pts_per_s/1e9:.2f} Gpoint/s "
          f"({100*pts_per_s/roofline:.1f}% of {bw/1e9:.0f} GB/s HBM roofline)",
          file=sys.stderr)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
