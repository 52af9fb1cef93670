"""Run driver: the TPU-native analogue of the reference's main()
(reference: src/main.cpp:23-138).

Flow parity: merge config -> CFL clamp with warning -> banner -> decomposition
(device mesh) -> IC -> IC min/max log -> open snapshot file -> time loop with
pre-update snapshots at ``n % out_every == 0`` -> timing line
``timing: total_max=<s> s, worst_avg_step=<s> s`` (greppable by the benchmark
harness, reference: run_benchmark.sh:34-39).

TPU-native differences: the time loop is chunked — each span between snapshot
points runs as ONE jitted ``lax.fori_loop`` program (halo exchange + BC +
fused stencil per step, all on device), so the host only intervenes at
snapshot cadence.  Snapshot host-transfers overlap the already-dispatched next
chunk (JAX async dispatch), the moral equivalent of the reference overlapping
PnetCDF writes with compute.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..config import SimConfig, bc_to_string
from ..ops.init import apply_initial_condition, device_initial_condition
from ..ops.stability import clamp_dt, combined_dt_limit
from ..ops.step import (
    PALLAS_KERNELS,
    build_single_device_advance,
    make_interior_step,
    select_kernel,
)
from ..io.snapshots import ShardedSnapshotWriter, SnapshotWriter
from ..parallel.mesh import choose_mesh_shape, divisible, field_sharding, make_mesh
from ..parallel.halo import build_sharded_advance, build_sharded_multistep_advance

_DTYPES = {"f32": jnp.float32, "f64": jnp.float64, "bf16": jnp.bfloat16}

_distributed_spec: Optional[str] = None


def maybe_init_distributed(cfg: SimConfig) -> None:
    """Multi-host setup (the MPI_Init analogue, main.cpp:24): must run
    before any backend touch.  ``distributed="auto"`` lets TPU pods
    self-discover; else "coordinator:port,num_processes,process_id"."""
    global _distributed_spec
    if not cfg.distributed:
        return
    if _distributed_spec is not None:
        # jax.distributed can only initialize once per process; a different
        # spec on a later run would be silently ignored, so fail loudly.
        if cfg.distributed != _distributed_spec:
            raise RuntimeError(
                f"distributed already initialized with {_distributed_spec!r};"
                f" cannot re-initialize with {cfg.distributed!r}"
            )
        return
    if cfg.distributed == "auto":
        jax.distributed.initialize()
    else:
        parts = cfg.distributed.split(",")
        if len(parts) != 3:
            raise ValueError(
                "distributed must be 'auto' or 'coordinator:port,num_processes,process_id'"
            )
        jax.distributed.initialize(
            coordinator_address=parts[0],
            num_processes=int(parts[1]),
            process_id=int(parts[2]),
        )
    _distributed_spec = cfg.distributed


def is_controller() -> bool:
    """True on the logging/IO process (rank 0 of the multi-controller run)."""
    return jax.process_index() == 0


def _bounded_sync(name: str, timeout_s: Optional[float] = None) -> None:
    """Cross-process barrier that FAILS rather than hangs when a peer dies.

    ``multihost_utils.sync_global_devices`` is a compiled collective with no
    timeout: if the controller dies between creating the snapshot file and
    reaching the barrier, every peer blocks forever (and the dead
    controller's interpreter then hangs in the distributed-shutdown atexit
    waiting for those peers — a cluster-wide deadlock, observed).  Use the
    coordination-service barrier instead: it errors when the leader dies
    and times out (default 600 s, ``CLIMATE_SIM_SYNC_TIMEOUT_S``) when a
    live peer never arrives."""
    client = None
    try:
        # Non-public module: fall back to the untimed collective barrier if
        # a JAX upgrade moves it (hang-prone on peer death, but functional).
        from jax._src import distributed

        client = getattr(distributed.global_state, "client", None)
    except Exception:
        pass
    if client is None:  # single-process / no coordination service
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
        return
    if timeout_s is None:
        timeout_s = float(os.environ.get("CLIMATE_SIM_SYNC_TIMEOUT_S", "600"))
    client.wait_at_barrier(name, timeout_in_ms=int(timeout_s * 1000))


def fetch_global(u: jax.Array) -> np.ndarray:
    """Materialize the full global field on this host.

    Multi-host: every host holds only its addressable shards, so gather via
    process_allgather.  The snapshot path does NOT use this on multi-host
    runs (each process hyperslab-writes its own shards, io.cpp:402-424
    analogue); this remains for ad-hoc inspection and final-state access.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(u, tiled=True))
    return np.asarray(jax.device_get(u))


def _field_stats(a: jax.Array) -> jax.Array:
    """[min, max, mean, l2] as ONE on-device vector — the diagnostic
    reductions the reference documents, computed without materializing the
    field on the host (one 4-scalar fetch when the caller reads it)."""
    af = a.astype(jnp.float32) if a.dtype == jnp.bfloat16 else a
    return jnp.stack(
        [jnp.min(af), jnp.max(af), jnp.mean(af), jnp.sqrt(jnp.sum(af * af))]
    )


@dataclasses.dataclass
class RunResult:
    u: jax.Array            # final state (never snapshotted unless write_final)
    total_time: float
    avg_step_time: float
    steps: int
    snapshots_written: int
    output_path: Optional[str]
    mesh_shape: Optional[tuple]
    dt: float
    clamped: bool


def _log(msg: str) -> None:
    if jax.process_count() > 1 and not is_controller():
        return
    print(msg, flush=True)


def setup_precision(cfg: SimConfig) -> None:
    # Two-way toggle: a prior f64 run in this process must not leave x64 on
    # (f32 Pallas hardware builds are disqualified under x64).  Only flip
    # when the flag actually differs, and say so — an embedding application
    # may have set x64 for its own reasons.
    want_x64 = cfg.precision == "f64"
    if bool(jax.config.read("jax_enable_x64")) != want_x64:
        _log(f"[precision] setting jax_enable_x64={want_x64} for {cfg.precision} run")
        jax.config.update("jax_enable_x64", want_x64)
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)


def resolve_auto_policies(cfg: SimConfig, mesh) -> SimConfig:
    """Resolve ``halo_overlap="auto"`` and ``steps_per_pass=0`` against the
    mesh topology (the measured policies quoted in config.py field docs).

    * halo_overlap auto: enable iff the mesh crosses DCN granules AND the
      per-shard tile is <= 1024² points (the stitch premium is negative or
      ~zero there and +46-63% at 2048²+, docs/performance.md "When does
      overlap pay?").  Forced true/false pass through.
    * steps_per_pass auto (0): 16 on DCN-crossing meshes (per-step exchange
      latency ~2L/k — doubling k halves the dominant DCN term at ~zero
      single-chip cost), else the on-chip default 8 (left as 0 here;
      pick_steps_per_pass applies it).
    """
    from ..parallel.mesh import dcn_granule_count

    dcn = dcn_granule_count(mesh.devices.ravel()) if mesh is not None else 1
    overlap = cfg.halo_overlap
    if overlap == "auto":
        overlap = False
        if mesh is not None and dcn > 1:
            # One-sided-periodic mixes qualify too: the overlap band
            # kernels fuse them at full k via the wrap consumer patches
            # (build_sharded_overlap_advance); a declined build falls back
            # to the full-depth slab path either way.
            px, py = mesh.shape["x"], mesh.shape["y"]
            if cfg.nx % px == 0 and cfg.ny % py == 0:
                overlap = (cfg.nx // px) * (cfg.ny // py) <= 1024 * 1024
        if overlap:
            _log(
                "[info] halo_overlap=auto -> enabled (mesh crosses"
                f" {dcn} DCN granules, shard tile <= 1024^2)"
            )
    spp = cfg.steps_per_pass
    if spp == 0 and dcn > 1:
        spp = 16
        _log(
            "[info] steps_per_pass=auto -> 16 (mesh crosses"
            f" {dcn} DCN granules; halves the per-step exchange-latency term)"
        )
    if overlap != cfg.halo_overlap or spp != cfg.steps_per_pass:
        cfg = dataclasses.replace(cfg, halo_overlap=overlap, steps_per_pass=spp)
    return cfg


def prepare(cfg: SimConfig, devices=None):
    """Resolve dtype, dt clamp, mesh, sharded/single advance, and the IC.

    Returns (u0, advance, mesh, dt).  ``advance(k)`` is a jitted function
    advancing the global field k steps.
    """
    maybe_init_distributed(cfg)
    setup_precision(cfg)
    dtype = _DTYPES[cfg.precision]

    dt, limit, clamped = clamp_dt(cfg.dt, cfg.dx, cfg.dy, cfg.vx, cfg.vy, cfg.D)
    if clamped and is_controller():
        # rank-0 warning, like the reference (main.cpp:44-47)
        print(
            f"[warn] dt={cfg.dt:g} exceeds stability limit {limit:g}"
            f" -> clamping to dt={dt:g}",
            file=sys.stderr,
            flush=True,
        )
    if cfg.precision == "bf16":
        # Long-horizon advisory (sibling of the combined-dt one below):
        # bf16 storage mode rounds the field once per ROUNDING EVENT —
        # one per k-step pass on the chained Pallas paths, one per STEP
        # on the jnp / per-step paths (kernel=jnp, or any fallback) —
        # and the error growth vs f32 is ~LINEAR in event count
        # (measured rel-L2 ~1e-3/pass upper envelope: 0.13 at 125
        # passes, 0.90 at 1250; docs/performance.md "bf16: a real
        # storage mode").  Estimate the run's event count and fail LOUD
        # past a ~5% budget instead of silently producing decorrelated
        # output at 60k steps.  (A Pallas request that later falls back
        # per-step rounds more often than estimated here — the advisory
        # is a floor, not a ceiling.)
        from ..ops.pallas_stencil import pick_steps_per_pass

        if select_kernel(cfg) in PALLAS_KERNELS:
            events = cfg.steps / max(
                1, pick_steps_per_pass(cfg, cfg.out_every or 8)
            )
        else:
            events = float(cfg.steps)  # per-step rounding paths
        est = 1e-3 * events
        if est > 0.05 and is_controller():
            print(
                f"[warn] precision=bf16 over {cfg.steps} steps"
                f" (~{events:.0f} rounding events): estimated relative"
                f" error vs f32 ~{est:.2g} (measured ~1e-3/event, linear"
                " growth — docs/performance.md).  bf16 storage mode is"
                " fit for short-horizon/memory-constrained runs; use"
                " precision=f32 for long-horizon accuracy",
                file=sys.stderr,
                flush=True,
            )
    comb = combined_dt_limit(cfg.dx, cfg.dy, cfg.vx, cfg.vy, cfg.D)
    if dt > comb * (1.0 + 1e-12) and is_controller():
        # Advisory only — the clamp keeps the reference's envelope
        # (behavioral parity), but that envelope is insufficient when
        # advection AND diffusion are active (see ops/stability.py).
        print(
            f"[warn] dt={dt:g} exceeds the COMBINED advection+diffusion"
            f" stability bound {comb:g}; the run may diverge"
            " (the reference's clamp envelope does not cover this case)",
            file=sys.stderr,
            flush=True,
        )

    devs = list(devices) if devices is not None else jax.devices()
    if cfg.max_devices:
        devs = devs[: cfg.max_devices]
    mesh = None
    if cfg.mesh.enable and len(devs) > 1:
        px, py = choose_mesh_shape(len(devs), cfg.nx, cfg.ny, cfg.mesh.x, cfg.mesh.y)
        mesh = make_mesh(px, py, devs)
    cfg = resolve_auto_policies(cfg, mesh)

    def place_ic(sharding):
        # Multi-process: materialize the IC sharded at birth (a host-array
        # device_put would allgather the global field on every process for
        # jax's cross-host equality check).  Single process: all shardings
        # are fully addressable, so the plain host-compute + device_put has
        # no such check and avoids an extra compiled program (the axon TPU
        # tunnel charges per deferred compile).
        if jax.process_count() > 1:
            return device_initial_condition(cfg, dtype, sharding)
        return jax.device_put(apply_initial_condition(cfg, dtype), sharding)

    def try_carrier(on_mesh=None, where=None):
        # Padded-carrier Pallas path: mesh-uniform aligned carrier, true
        # edges at runtime flags (slab-kernel class; the jnp fallbacks
        # below are ~7x slower).  None when no geometry/layout fits.
        # ``on_mesh`` defaults to the run mesh; the single-chip dispatch
        # passes a 1x1 mesh and its own banner suffix.
        if select_kernel(cfg) not in PALLAS_KERNELS:
            return None
        from ..parallel.halo import build_carrier_slab_advance

        m = on_mesh if on_mesh is not None else mesh
        adv = build_carrier_slab_advance(
            cfg, m, dt, dtype_name=jnp.dtype(dtype).name
        )
        if adv is not None:
            ncy, ncx = adv.carrier_shape
            _log(
                f"[info] grid {cfg.nx}x{cfg.ny} "
                + (where or "has no aligned uniform shards on the"
                   f" {m.shape['x']}x{m.shape['y']} mesh")
                + f"; running the Pallas CARRIER path ({ncx}x{ncy}"
                " carrier, true edges at runtime flags)"
            )
        return adv

    if mesh is not None and divisible(mesh, cfg.nx, cfg.ny):
        advance = None
        if select_kernel(cfg) in PALLAS_KERNELS:
            # Multi-chip fast path: one k-wide halo exchange per k steps,
            # Pallas multi-step kernel per shard.  halo_overlap=true splits
            # interior/edge-band kernels so the ppermutes overlap compute.
            if cfg.halo_overlap:
                from ..parallel.halo import build_sharded_overlap_advance

                advance = build_sharded_overlap_advance(
                    cfg, mesh, dt, dtype_name=jnp.dtype(dtype).name
                )
            if advance is None:
                advance = build_sharded_multistep_advance(
                    cfg, mesh, dt, dtype_name=jnp.dtype(dtype).name
                )
            if advance is None or not getattr(advance, "uses_slabs", True):
                # Divisible but tile-MISALIGNED (e.g. 500-wide shards):
                # the aligned carrier beats the assembled-tile fallback
                # (~2x measured) — prefer it when its geometry fits.
                carrier = try_carrier()
                if carrier is not None:
                    advance = carrier
        if advance is not None and hasattr(advance, "embed"):
            from jax.sharding import NamedSharding, PartitionSpec

            u0 = place_ic(NamedSharding(mesh, PartitionSpec(None, None)))
        else:
            u0 = place_ic(field_sharding(mesh))
        if advance is None:
            interior = make_interior_step(cfg, dt)
            advance = build_sharded_advance(cfg, mesh, dt, interior)
    else:
        advance = None
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            advance = try_carrier()
            if advance is not None:
                u0 = place_ic(NamedSharding(mesh, PartitionSpec(None, None)))
        if mesh is not None and advance is None:
            # Indivisible grid, no carrier layout: shard only the axes the
            # mesh divides evenly (JAX refuses uneven explicit shardings)
            # and let GSPMD partition the global program (decision log #6)
            # — compiler-managed halos, jnp path forced (a manual Pallas
            # call cannot be auto-partitioned by GSPMD).
            if select_kernel(cfg) in PALLAS_KERNELS and is_controller():
                print(
                    f"[warn] kernel={select_kernel(cfg)} requested but the"
                    f" {cfg.nx}x{cfg.ny} grid fits no Pallas layout on this"
                    " mesh: downgrading to the jnp-class GSPMD path"
                    " (~7x slower per chip) — benchmark numbers from this"
                    " run are NOT Pallas-path numbers",
                    file=sys.stderr,
                    flush=True,
                )
            sy = "y" if cfg.ny % mesh.shape["y"] == 0 else None
            sx = "x" if cfg.nx % mesh.shape["x"] == 0 else None
            if sy is None and sx is None:
                # Indivisible along BOTH axes: embed in a padded carrier of
                # the next mesh-multiple shape so compute still scales with
                # the mesh (the padding alternative of decision log #6;
                # previously this degraded to a single-device run).  The
                # field itself stays (ny, nx), replicated at the jit
                # boundary; the snapshot writer dedups replicas.
                from ..parallel.halo import build_padded_gspmd_advance

                _log(
                    f"[info] grid {cfg.nx}x{cfg.ny} is indivisible along"
                    f" both axes of the {len(devs)}-device mesh; running"
                    " the padded GSPMD path (carrier"
                    f" {-(-cfg.nx // mesh.shape['x']) * mesh.shape['x']}x"
                    f"{-(-cfg.ny // mesh.shape['y']) * mesh.shape['y']})"
                )
                u0 = place_ic(NamedSharding(mesh, PartitionSpec(None, None)))
                advance = build_padded_gspmd_advance(cfg, mesh, dt)
            else:
                u0 = place_ic(NamedSharding(mesh, PartitionSpec(sy, sx)))
                cfg = dataclasses.replace(cfg, kernel="jnp")
        if mesh is None:
            from jax.sharding import SingleDeviceSharding

            if advance is None:
                # SINGLE-CHIP misaligned grids: the fused/assembled
                # single-device layouts decline shapes like 2500² (no
                # 128-multiple width / sublane-hostile heights) and fall
                # to jnp-class rates, but the padded-carrier kernel runs
                # them at slab-class speed on a 1x1 mesh (window-matched
                # 183.7 vs 52.5 Gpt/s at 2500²; BASELINE r05 — the
                # carrier beat the best non-carrier option on every
                # misaligned row ever measured).  Aligned grids return
                # None here and keep the (faster) single-device path.
                from jax.sharding import NamedSharding, PartitionSpec

                solo = make_mesh(1, 1, devs[:1])
                car = try_carrier(
                    on_mesh=solo,
                    where="fits no aligned single-device kernel layout"
                    " on this chip",
                )
                if car is not None:
                    u0 = place_ic(
                        NamedSharding(solo, PartitionSpec(None, None))
                    )
                    advance = car
            if advance is None:
                u0 = place_ic(SingleDeviceSharding(devs[0]))
        if advance is None:
            advance = build_single_device_advance(cfg, dt)

    return u0, advance, mesh, dt, clamped


def run_simulation(cfg: SimConfig, devices=None, write_output: bool = True) -> RunResult:
    """Execute a full run (the reference main loop, main.cpp:93-133)."""
    u, advance, mesh, dt, clamped = prepare(cfg, devices)
    # Record the dt actually used: the reference clamps cfg.dt in place
    # before writing metadata (main.cpp:42-49), so the snapshot attrs must
    # carry the clamped value.
    cfg = dataclasses.replace(cfg, dt=dt)

    _log(
        "climate-sim-tpu\n"
        f"  grid: {cfg.nx} x {cfg.ny}  dt: {dt:g}  steps: {cfg.steps}"
        f"  D: {cfg.D:g}  v=({cfg.vx:g},{cfg.vy:g})\n"
        f"  bc: left={bc_to_string(cfg.bc.left)} right={bc_to_string(cfg.bc.right)}"
        f" bottom={bc_to_string(cfg.bc.bottom)} top={bc_to_string(cfg.bc.top)}"
    )
    if mesh is not None:
        _log(f"  mesh: x={mesh.shape['x']} y={mesh.shape['y']} ({len(mesh.devices.ravel())} devices)")

    # IC sanity log via on-device reductions (a 4-scalar fetch, not a global
    # gather) — also the sync point that surfaces a bad IC before the
    # snapshot file is created.
    stats = jax.jit(_field_stats)
    ic_stats = np.asarray(jax.device_get(stats(u)), dtype=np.float64)
    _log(f"IC min/max: {ic_stats[0]:g} / {ic_stats[1]:g}")

    # Carrier-path advances (padded indivisible grids) keep the CARRIER as
    # loop state and expose embed/extract; snapshots, diagnostics and the
    # final result see the true-extent view only.
    extract = getattr(advance, "extract", None)
    if hasattr(advance, "embed"):
        u = advance.embed(u)

    def view(x):
        return extract(x) if extract is not None else x

    multi_host = jax.process_count() > 1
    writer = None
    sharded_writer = None
    out_path = None
    if write_output and cfg.output_enable:
        out_path = cfg.resolved_output_path()
        _log("Opening NetCDF file for output")
        if multi_host:
            # Parallel hyperslab snapshot writes (io.cpp:402-424 analogue):
            # the controller creates the file + header, then every process
            # attaches and writes only its own shard rows.  No host ever
            # holds the global array.
            if is_controller():
                try:
                    sharded_writer = ShardedSnapshotWriter(
                        out_path, cfg, create=True
                    )
                except Exception:
                    # Peers are already committed to the open barrier and
                    # will stall until the coordinator's heartbeat timeout
                    # tears the job down; make sure the REAL error (disk
                    # full, permissions, ...) is on the controller's stderr
                    # before that masks it.
                    import traceback

                    traceback.print_exc()
                    raise
            _bounded_sync("climate_sim_tpu:snapshot_open")
            if not is_controller():
                sharded_writer = ShardedSnapshotWriter(out_path, cfg, create=False)
        else:
            writer = SnapshotWriter(out_path, cfg)

    def emit_snapshot(frame_src: jax.Array) -> None:
        if sharded_writer is not None:
            sharded_writer.write_shards(frame_src)
        elif writer is not None:
            writer.write(fetch_global(frame_src))

    # Chunk programs python-unroll their kernel passes (a fori_loop was
    # measured 13% slower — docs/performance.md), so an unbounded span
    # would compile an out_every-step program: at production cadences
    # (snapshot-rarely runs, e.g. out_every=60000) that is thousands of
    # unrolled passes and a compile-time explosion.  Cap each dispatched
    # program and loop host-side instead — chained dispatches run
    # back-to-back on device (11-14 us gaps measured), so the split costs
    # nothing while keeping compile time O(cap).
    max_dispatch = 256

    def span_pieces(k: int):
        pieces = []
        while k > 0:
            kk = min(k, max_dispatch)
            pieces.append(kk)
            k -= kk
        return pieces

    # Warm-up: AOT-compile every distinct chunk program outside the timed
    # region (the reference pays no JIT cost; and through a remote-compile
    # TPU tunnel the first execution would otherwise absorb ~seconds of
    # compilation into the timing).
    chunk_sizes = set()
    n = 0
    while n < cfg.steps:
        k = min(cfg.out_every - (n % cfg.out_every), cfg.steps - n)
        chunk_sizes.update(span_pieces(k))
        n += k
    compiled = {}
    for k in chunk_sizes:
        fn = advance(k)
        try:
            compiled[k] = fn.lower(u).compile()
        except Exception:
            compiled[k] = fn
    if extract is not None:
        view(u).block_until_ready()  # compile outside the timed region

    def advance_compiled(k):
        return compiled.get(k) or advance(k)

    def dispatch_span(u, k):
        # All pieces dispatch asynchronously (no host sync between them).
        for kk in span_pieces(k):
            u = advance_compiled(kk)(u)
        return u

    profiling = bool(cfg.profile_dir)
    if profiling:
        _log(f"profiler trace -> {cfg.profile_dir}")
        jax.profiler.start_trace(cfg.profile_dir)

    any_writer = writer is not None or sharded_writer is not None
    snapshots = 0
    diag_pending = []  # (step, on-device stats vector): fetched AFTER timing
    n = 0
    t0 = time.perf_counter()
    while n < cfg.steps:
        k = min(cfg.out_every - (n % cfg.out_every), cfg.steps - n)
        if n % cfg.out_every == 0 and any_writer:
            u_snap = u
            u = dispatch_span(u, k)  # dispatch next chunk before the host transfer
            emit_snapshot(view(u_snap))
            snapshots += 1
        else:
            u = dispatch_span(u, k)
        if cfg.diagnostics_every and (n // cfg.out_every) % max(1, cfg.diagnostics_every) == 0:
            # Dispatch the reductions now, fetch after the timed loop.  The
            # host sync/transfer cost (the dominant distortion through a
            # remote tunnel) is fully excluded from the timing line; the
            # device-side cost — one fused min/max/mean/L2 pass over the
            # field per diagnostics event, ~1 HBM read — remains in the
            # timed region, as any in-loop diagnostic must (~1-2% of an
            # out_every=100 chunk; grows as out_every shrinks).  Keeping
            # field references to defer the dispatch too would pin one full
            # field in HBM per pending event.
            diag_pending.append((n + k, stats(view(u))))
        n += k
    u.block_until_ready()
    total = time.perf_counter() - t0
    u = view(u)
    if profiling:
        jax.profiler.stop_trace()

    for step, vec in diag_pending:
        mn, mx, mean, l2 = np.asarray(jax.device_get(vec), dtype=np.float64)
        _log(f"diag: step={step} min={mn:.6g} max={mx:.6g} mean={mean:.6g} l2={l2:.6g}")

    if cfg.write_final and any_writer:
        emit_snapshot(u)
        snapshots += 1
    for w in (writer, sharded_writer):
        if w is not None:
            w.close()

    if multi_host:
        # MPI_Reduce(MAX) analogue (main.cpp:127-128): max wall time over hosts.
        from jax.experimental import multihost_utils

        total = float(
            np.max(multihost_utils.process_allgather(jnp.asarray([total])))
        )
    avg_step = total / max(1, cfg.steps)
    _log(f"timing: total_max={total:g} s, worst_avg_step={avg_step:g} s")
    # Derived throughput (SURVEY.md §5 tracing plan): the per-chip rate the
    # benchmark methodology is defined in terms of.
    n_dev = 1 if mesh is None else mesh.devices.size  # single-device path uses one chip
    pts = cfg.nx * cfg.ny * cfg.steps / max(total, 1e-12)
    _log(f"throughput: {pts / 1e6:.1f} Mpoint/s total, "
         f"{pts / 1e6 / max(1, n_dev):.1f} Mpoint/s/chip")

    return RunResult(
        u=u,
        total_time=total,
        avg_step_time=avg_step,
        steps=cfg.steps,
        snapshots_written=snapshots,
        output_path=out_path,
        mesh_shape=(mesh.shape["y"], mesh.shape["x"]) if mesh is not None else None,
        dt=dt,
        clamped=clamped,
    )
