"""Initial conditions (reference: src/init.cpp).

Presets:

* ``gaussian_hotspot`` — ``A * exp(-r^2 / (2 sigma^2))`` evaluated at cell
  centers ``x = (gi + 0.5) dx`` with ``sigma = sigma_frac * min(Lx, Ly)``
  (init.cpp:12-33).  Computed from *global* coordinates so the field is
  identical regardless of decomposition.
* ``constant_zero`` — zeros (init.cpp:39-40).
* Unknown presets raise (init.cpp:41-42).

``ic.mode == "file"`` is implemented for real here (decision log #2): the
reference throws "IC mode 'file' not supported in PnetCDF build"
(init.cpp:44-46) despite shipping the config plumbing and the
``scripts/generate_ic.py`` producer.  We read the variable (default ``u``)
from a classic-NetCDF file; a 3D ``(time, y, x)`` variable restarts from its
*last* snapshot, enabling checkpoint-resume from our own output files.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import SimConfig


def gaussian_hotspot(cfg: SimConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Gaussian bump at cell centers (reference: init.cpp:12-33)."""
    nx, ny = cfg.nx, cfg.ny
    Lx = nx * cfg.dx
    Ly = ny * cfg.dy
    xc = cfg.ic.xc_frac * Lx
    yc = cfg.ic.yc_frac * Ly
    sig = cfg.ic.sigma_frac * min(Lx, Ly)

    # Coordinates are computed in at-least-f32 regardless of the storage dtype
    # so that bf16 runs still place the bump at the right cells.
    coord_dtype = jnp.float64 if dtype == jnp.float64 else jnp.float32
    x = (jnp.arange(nx, dtype=coord_dtype) + 0.5) * cfg.dx
    y = (jnp.arange(ny, dtype=coord_dtype) + 0.5) * cfg.dy
    r2 = (x[None, :] - xc) ** 2 + (y[:, None] - yc) ** 2
    u = cfg.ic.A * jnp.exp(-r2 / (2.0 * sig * sig))
    return u.astype(dtype)


def constant_zero(cfg: SimConfig, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros((cfg.ny, cfg.nx), dtype=dtype)


def from_file(cfg: SimConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Read the IC from a NetCDF file (completes the reference's stub).

    Accepts both format families: classic CDF-1/2/5 (this framework's own
    snapshots) and NETCDF4/HDF5 — the format the reference ecosystem's IC
    producer writes (reference scripts/generate_ic.py:23).  A 3D
    ``(time, y, x)`` variable restarts from its last record.
    """
    from ..io.datasets import load_field

    path = cfg.ic.path
    if not path:
        raise ValueError("ic.mode='file' requires ic.path")
    data = load_field(path, cfg.ic.var or "u")
    if data.shape != (cfg.ny, cfg.nx):
        raise ValueError(
            f"IC shape {data.shape} does not match grid (ny={cfg.ny}, nx={cfg.nx})"
        )
    return jnp.asarray(data, dtype=dtype)


def _preset_fn(cfg: SimConfig, dtype):
    """Resolve the preset to a zero-arg jnp builder (init.cpp:35-42)."""
    if cfg.ic.preset == "gaussian_hotspot":
        return lambda: gaussian_hotspot(cfg, dtype)
    if cfg.ic.preset == "constant_zero":
        return lambda: constant_zero(cfg, dtype)
    raise ValueError(f"Unknown IC preset: {cfg.ic.preset}")


def apply_initial_condition(cfg: SimConfig, dtype=jnp.float32) -> jnp.ndarray:
    """Dispatch on ic.mode/preset (reference: init.cpp:35-47)."""
    if cfg.ic.mode == "preset":
        return _preset_fn(cfg, dtype)()
    if cfg.ic.mode == "file":
        return from_file(cfg, dtype)
    raise ValueError(f"Unknown IC mode: {cfg.ic.mode}")


def device_initial_condition(cfg: SimConfig, dtype, sharding) -> "jnp.ndarray":
    """Build the IC directly on device(s) with the given sharding.

    Pod-scale contract: preset ICs are pure functions of *global* cell
    coordinates, so they are materialized sharded at birth via
    ``jit(..., out_shardings=...)`` — each device computes only its own
    block and no host ever holds (or cross-host-verifies) the (ny, nx)
    global array.  (A plain ``device_put(host_array, sharding)`` would
    allgather the full array on every process for jax's multi-host equality
    check — O(global) traffic the reference's per-rank local init,
    init.cpp:12-33, never pays.)

    File ICs are likewise shard-local: the file is opened ONCE per process
    (``io.datasets.open_field``), and each addressable shard region is
    served from that handle's positioned reads via
    ``make_array_from_callback`` — the read-side analogue of the writer's
    per-process hyperslabs (reference: io.cpp:402-424), so restart never
    materializes the global field on any host, and never re-parses the
    file's header per shard.
    """
    import jax

    if cfg.ic.mode == "preset":
        build = _preset_fn(cfg, dtype)
        return jax.jit(build, out_shardings=sharding)()
    if cfg.ic.mode == "file":
        from ..io.datasets import open_field

        path = cfg.ic.path
        if not path:
            raise ValueError("ic.mode='file' requires ic.path")
        var = cfg.ic.var or "u"
        with open_field(path, var) as h:
            if h.shape != (cfg.ny, cfg.nx):
                raise ValueError(
                    f"IC shape {h.shape} does not match grid"
                    f" (ny={cfg.ny}, nx={cfg.nx})"
                )

            def shard_block(idx):
                ys, xs = (sl.indices(n) for sl, n in zip(idx, (cfg.ny, cfg.nx)))
                block = h.read_region(ys[0], ys[1] - ys[0], xs[0], xs[1] - xs[0])
                return block.astype(dtype)

            return jax.make_array_from_callback(
                (cfg.ny, cfg.nx), sharding, shard_block
            )
    raise ValueError(f"Unknown IC mode: {cfg.ic.mode}")
