"""Sharded multi-step path: k-wide ppermute halo exchange + per-shard Pallas
multi-step kernel (edge-flag-gated BC fixups), vs the single-device oracle.

Runs on the virtual 8-device CPU mesh (conftest) with the kernel in
interpret mode — the multi-chip analogue of the reference's 4-rank halo
tests (reference: tests/simulation/unit/test_halo.cpp).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climate_sim_tpu.config import BCConfig, BCType, SimConfig
from climate_sim_tpu.ops.init import gaussian_hotspot
from climate_sim_tpu.ops.step import reference_step
from climate_sim_tpu.parallel.halo import (
    build_sharded_multistep_advance,
    exchange_halos_k,
)
from climate_sim_tpu.parallel.mesh import field_sharding, make_mesh

D4 = (BCType.DIRICHLET,) * 4
P4 = (BCType.PERIODIC,) * 4
MIX = (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.PERIODIC)


def make_cfg(nx, ny, bcs, out_every=8):
    cfg = SimConfig(
        nx=nx, ny=ny, D=0.05, vx=0.5, vy=-0.25, dt=0.1, steps=16, out_every=out_every
    )
    cfg.bc = BCConfig(*bcs)
    return cfg


def oracle(u, cfg, steps):
    for _ in range(steps):
        u = reference_step(u, cfg, cfg.dt)
    return u


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 2), (1, 8)])
@pytest.mark.parametrize("bcs", [D4, P4, MIX])
def test_sharded_multistep_matches_oracle(mesh_shape, bcs):
    px, py = mesh_shape
    cfg = make_cfg(64 * px, 64 * py, bcs)
    mesh = make_mesh(px, py, jax.devices()[: px * py])
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 16)
    us = jax.device_put(u, field_sharding(mesh))
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    out = adv(16)(us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_sharded_multistep_chunk_remainder():
    cfg = make_cfg(256, 128, MIX)
    mesh = make_mesh(4, 2)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 11)
    us = jax.device_put(u, field_sharding(mesh))
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    out = adv(11)(us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_sharded_multistep_rejects_indivisible():
    cfg = make_cfg(250, 130, D4)
    mesh = make_mesh(4, 2)
    assert build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True) is None


def test_exchange_halos_k_faces():
    """Each shard fills its tile with its linear rank; after a k-wide
    exchange, halo slabs hold the cyclic neighbor's rank (test_halo.cpp:8-63
    analogue, width k).  py >= 3 so the up and wrap-down neighbors differ
    (a y-direction swap cannot pass)."""
    px, py, k, m = 2, 4, 3, 8
    mesh = make_mesh(px, py)

    def body(u):
        xi = jax.lax.axis_index("x")
        yi = jax.lax.axis_index("y")
        rank = (yi * px + xi).astype(jnp.float32)
        tile = jnp.full((m, m), rank)
        return exchange_halos_k(tile, px, py, k)

    from jax.sharding import PartitionSpec

    out = jax.jit(
        jax.shard_map(
            lambda u: body(u),
            mesh=mesh,
            in_specs=PartitionSpec("y", "x"),
            out_specs=PartitionSpec("y", "x"),
            check_vma=False,
        )
    )(jnp.zeros((py * (m + 2 * k), px * (m + 2 * k)), jnp.float32))

    host = np.asarray(out)
    # shard (yi=1, xi=1) occupies rows (m+2k):2(m+2k), cols (m+2k):2(m+2k).
    t = host[(m + 2 * k) : 2 * (m + 2 * k), (m + 2 * k) : 2 * (m + 2 * k)]
    rank = 1.0 * px + 1.0  # (yi=1, xi=1) -> 3
    assert np.all(t[k : m + k, k : m + k] == rank)          # interior: own rank
    assert np.all(t[k : m + k, :k] == rank - 1)             # left neighbor (xi=0)
    assert np.all(t[k : m + k, m + k :] == rank - 1)        # right wraps (px=2)
    assert np.all(t[:k, k : m + k] == rank - px)            # bottom neighbor (yi=0)
    assert np.all(t[m + k :, k : m + k] == rank + px)       # top neighbor (yi=2)


@pytest.mark.parametrize("bcs", [D4, P4, MIX])
def test_overlap_path_matches_oracle(bcs):
    """Interior/edge-band split pass (halo_overlap) == oracle."""
    from climate_sim_tpu.parallel.halo import build_sharded_overlap_advance

    cfg = make_cfg(256, 128, bcs)
    mesh = make_mesh(4, 2)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 16)
    us = jax.device_put(u, field_sharding(mesh))
    adv = build_sharded_overlap_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    out = adv(16)(us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_overlap_path_rejects_tiny_tiles():
    from climate_sim_tpu.parallel.halo import build_sharded_overlap_advance

    cfg = make_cfg(32, 4, D4)  # 8x2 tiles: interior empty even at k=1
    mesh = make_mesh(4, 2)
    assert build_sharded_overlap_advance(cfg, mesh, cfg.dt, interpret=True) is None


@pytest.mark.parametrize("bcs", [
    D4,
    (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET),
])
def test_overlap_path_carries_bf16(bcs):
    """bf16 STORAGE mode on the OVERLAP path (r05): every region build
    takes the chained form via the 16-row bf16 band geometry (band
    height, halo depth and x band width all rounded to 16), so
    halo_overlap no longer silently does nothing for bf16 runs.  Error
    vs the f32 oracle stays at the one-rounding-per-pass scale; the
    one-sided row additionally exercises the wrap consumer patches in
    the bf16 band kernels.  Hardware-probing with a mismatched x64 flag
    must still fall back cleanly (None), never crash at trace time."""
    from climate_sim_tpu.ops.step import reference_step
    from climate_sim_tpu.parallel.halo import build_sharded_overlap_advance

    cfg = make_cfg(256, 256, bcs)
    mesh = make_mesh(2, 2, jax.devices()[:4])
    adv = build_sharded_overlap_advance(
        cfg, mesh, cfg.dt, interpret=True, dtype_name="bfloat16"
    )
    assert adv is not None, "bf16 overlap no longer builds"
    u32 = gaussian_hotspot(cfg, jnp.float32)
    u32 = u32 + 0.4 * jnp.roll(u32, cfg.ny // 2 - 2, 0) \
              + 0.4 * jnp.roll(u32, cfg.nx // 2 - 2, 1)
    u = jax.device_put(u32.astype(jnp.bfloat16), field_sharding(mesh))
    out = adv(8)(u)
    assert out.dtype == jnp.bfloat16
    ref = u32
    for _ in range(8):
        ref = reference_step(ref, cfg, cfg.dt)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert d.max() < 1.6e-2, f"bf16 overlap error too large: {d.max()}"

    # hardware-mode probe under the suite's x64 flag: clean None, no crash
    assert build_sharded_overlap_advance(
        cfg, mesh, cfg.dt, interpret=False, dtype_name="bfloat16"
    ) is None


@pytest.mark.parametrize("mesh_shape", [(2, 2), (1, 4), (4, 1)])
@pytest.mark.parametrize("bcs", [D4, P4, MIX])
def test_slab_path_matches_oracle(mesh_shape, bcs):
    """Slab-input fast path (tile + compact halo slabs, no padded-tile
    materialization): tiles are 128-multiples wide so the slab kernel
    engages; includes a non-multiple-of-8 chunk remainder."""
    from climate_sim_tpu.ops.pallas_stencil import sharded_tile_slab_multistep

    px, py = mesh_shape
    cfg = make_cfg(128 * px, 128 * py, bcs, out_every=8)
    mx, my = 128, 128
    for kk in range(1, 9):  # the advance requires probes for EVERY pass size
        assert sharded_tile_slab_multistep(
            None, None, None, None, cfg, cfg.dt, kk, True,
            probe=True, probe_shape=(my, mx),
        ) is not None, kk
    mesh = make_mesh(px, py, jax.devices()[: px * py])
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 19)
    us = jax.device_put(u, field_sharding(mesh))
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    out = adv(19)(us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("tile", [(128, 1024), (4096, 128)])
def test_slab_path_multi_block_tiles(tile):
    """Slab kernel with MULTI-block tiles (nby>1 for tall, nbx>1 for wide):
    exercises the tile-sourced row segments, inner x strips, and clamped
    not-taken DMA starts that single-block tiles never reach
    (code-review coverage finding)."""
    mx, my = tile
    cfg = make_cfg(mx, my, MIX, out_every=8)
    mesh = make_mesh(1, 1, jax.devices()[:1])
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 8)
    us = jax.device_put(u, field_sharding(mesh))
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    out = adv(8)(us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_exchange_halos_slabs_layout():
    """Slab layout contract: xhalo carries left ghosts right-aligned in
    [128-k,128) and right ghosts at [128,128+k); yhalo rows are
    bottom-then-top pads at kernel width with diagonal corners."""
    px, py, k, m = 4, 2, 4, 8
    mesh = make_mesh(px, py)

    def body(_):
        from climate_sim_tpu.parallel.halo import exchange_halos_slabs

        xi = jax.lax.axis_index("x")
        yi = jax.lax.axis_index("y")
        rank = (yi * px + xi).astype(jnp.float32)
        tile = jnp.full((m, m), rank)
        xh, yh = exchange_halos_slabs(tile, px, py, k)
        # stack xhalo (m, 256) over yhalo (2k, m+256) cropped to 256 cols
        return jnp.concatenate([xh, yh[:, :256]], axis=0)

    from jax.sharding import PartitionSpec

    rows = m + 2 * k
    out = jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=PartitionSpec("y", "x"), out_specs=PartitionSpec("y", "x"),
        check_vma=False,
    ))(jnp.zeros((py * rows, px * 256), jnp.float32))
    host = np.asarray(out)
    # shard (yi=0, xi=1): left neighbor rank 0, right neighbor rank 2 —
    # distinct, so a swapped xhalo layout cannot pass.
    t = host[:rows, 256:512]
    assert np.all(t[:m, 128 - k : 128] == 0.0)   # left ghost block (xi=0)
    assert np.all(t[:m, 128 : 128 + k] == 2.0)   # right ghost block (xi=2)
    assert np.all(t[:m, : 128 - k] == 0.0)       # alignment zeros
    assert np.all(t[:m, 128 + k :] == 0.0)
    # yhalo (cropped to its first 256 cols): layout is
    # [zeros(128-k) | gl (k cols) | tile cols ...]; bottom pad rows wrap to
    # (yi=1, xi=1) = rank 5 whose LEFT-ghost cols are the diagonal
    # (yi=1, xi=0) = rank 4.
    yh = t[m : m + 2 * k, :]
    assert np.all(yh[:, : 128 - k] == 0.0)                   # alignment zeros
    assert np.all(yh[:k, 128 - k : 128] == 4.0)              # bottom pad, diagonal gl
    assert np.all(yh[:k, 128 : 128 + m] == 5.0)              # bottom pad, tile cols
    assert np.all(yh[:k, 128 + m : 128 + m + k] == 6.0)      # bottom pad, diagonal gr
    assert np.all(yh[k:, 128 - k : 128] == 4.0)              # top pad (same y nbr, py=2)
    assert np.all(yh[k:, 128 : 128 + m] == 5.0)


def test_sharded_one_sided_periodic_matches_oracle():
    """One side of the y axis periodic (the reference dev.yaml's BC mix)
    on tiles too narrow for the slab layout (64 wide): the dispatcher
    drops to capped one-step assembled passes and stays exact, with extra
    mass parked against the periodic edge.  (Slab-layout tiles fuse at
    full k instead — test_sharded_one_sided_y_schedule.)"""
    bcs = (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET)
    cfg = make_cfg(256, 128, bcs)
    mesh = make_mesh(4, 2)
    u = gaussian_hotspot(cfg, jnp.float32)
    u = u + 0.5 * jnp.roll(u, u.shape[0] // 2 - 2, axis=0)
    ref = oracle(u, cfg, 16)
    us = jax.device_put(u, field_sharding(mesh))
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    assert not adv.uses_slabs  # 64-wide tiles: assembled k=1 fallback
    out = adv(16)(us)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("mesh_shape,bcs", [
    ((2, 4), (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET)),
    ((4, 2), (BCType.DIRICHLET, BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC)),
    ((1, 8), (BCType.PERIODIC, BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET)),
    ((8, 1), (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.NEUMANN)),
])
def test_sharded_one_sided_y_schedule(mesh_shape, bcs):
    """Sharded ghost-row schedule across mesh shapes: both orientations,
    x-wrap corners, a py=1 self-wrap axis, and an 8-wide x split; 19 steps
    include k=8 passes plus a kk=3 remainder."""
    px, py = mesh_shape
    mx, my = 128, 64
    cfg = make_cfg(mx * px, my * py, bcs)
    u = gaussian_hotspot(cfg, jnp.float32)
    u = u + 0.5 * jnp.roll(u, cfg.ny // 2 - 2, axis=0)
    ref = oracle(u, cfg, 19)
    mesh = make_mesh(px, py)
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None and adv.uses_slabs
    out = adv(19)(jax.device_put(u, field_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("mesh_shape,bcs", [
    ((2, 4), (BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN, BCType.DIRICHLET)),
    ((4, 2), (BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET, BCType.DIRICHLET)),
    ((1, 8), (BCType.PERIODIC, BCType.NEUMANN, BCType.PERIODIC, BCType.PERIODIC)),
    ((8, 1), (BCType.DIRICHLET, BCType.PERIODIC, BCType.PERIODIC, BCType.PERIODIC)),
])
def test_sharded_one_sided_x_schedule(mesh_shape, bcs):
    """Sharded one-sided-periodic-x fuses at full k (wrap delivery via the
    cyclic x exchange + the kernel's wrap_x consumer patch) across mesh
    shapes: both orientations, y-wrap extensions, a px=1 self-wrap axis,
    and an 8-tall y split; mass parked at the periodic x edge; remainder
    pass included."""
    px, py = mesh_shape
    mx, my = 128, 64
    cfg = make_cfg(mx * px, my * py, bcs)
    u = gaussian_hotspot(cfg, jnp.float32)
    u = u + 0.5 * jnp.roll(u, cfg.nx // 2 - 2, axis=1)
    ref = oracle(u, cfg, 19)
    mesh = make_mesh(px, py)
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None and adv.uses_slabs
    out = adv(19)(jax.device_put(u, field_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("bcs,axis,mesh_shape", [
    # y schedule at k=khalo=8 (zero creep slack), 1x2 mesh
    ((BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET), 0, (1, 2)),
    # x schedule at k=khalo=8, 2x1 mesh
    ((BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN, BCType.DIRICHLET), 1, (2, 1)),
])
def test_sharded_schedule_full_k8_tightest_margin(bcs, axis, mesh_shape):
    """256x256 tiles let pick_steps_per_pass reach k=8 = khalo: the
    schedules' creep margins (strip rows/columns, zero-pad x columns,
    roll-wrapped extremes) run with ZERO slack — an off-by-one that only
    holds for k < khalo would pass every smaller-tile test and fail only
    at production pass sizes (review finding)."""
    from climate_sim_tpu.ops.pallas_stencil import pick_steps_per_pass

    px, py = mesh_shape
    cfg = make_cfg(256 * px, 256 * py, bcs, out_every=16)
    tile_cfg = make_cfg(256, 256, bcs, out_every=16)
    assert pick_steps_per_pass(tile_cfg, 16) == 8
    u = gaussian_hotspot(cfg, jnp.float32)
    roll_ax = 0 if axis == 0 else 1
    u = u + 0.5 * jnp.roll(u, u.shape[roll_ax] // 2 - 2, axis=roll_ax)
    ref = oracle(u, cfg, 16)
    mesh = make_mesh(px, py)
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None and adv.uses_slabs
    out = adv(16)(jax.device_put(u, field_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


@pytest.mark.parametrize("mesh_shape,bcs", [
    ((2, 4), (BCType.PERIODIC, BCType.DIRICHLET, BCType.PERIODIC, BCType.NEUMANN)),
    ((4, 2), (BCType.PERIODIC, BCType.NEUMANN, BCType.NEUMANN, BCType.PERIODIC)),
    ((2, 2), (BCType.DIRICHLET, BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET)),
    ((1, 8), (BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET, BCType.PERIODIC)),
    ((8, 1), (BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC)),
])
def test_sharded_both_axes_one_sided_schedules(mesh_shape, bcs):
    """BOTH axes one-sided-periodic fuse at full k on the slab path: wrap
    data arrives via both cyclic exchanges (corner blocks included) and
    the kernel applies both axes' wrap_*_mask consumer patches, which
    compose on the corner wrap data.  All four corner orientations,
    self-wrap axes (1x8 / 8x1), and a remainder pass; mass parked against
    both periodic edges."""
    px, py = mesh_shape
    mx, my = 128, 64
    cfg = make_cfg(mx * px, my * py, bcs)
    u = gaussian_hotspot(cfg, jnp.float32)
    u = (
        u
        + 0.5 * jnp.roll(u, cfg.ny // 2 - 2, axis=0)
        + 0.5 * jnp.roll(u, cfg.nx // 2 - 2, axis=1)
    )
    ref = oracle(u, cfg, 19)
    mesh = make_mesh(px, py)
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None and adv.uses_slabs
    out = adv(19)(jax.device_put(u, field_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_sharded_both_axes_corner_mass_full_k8():
    """Both-axes schedules at k = khalo = 8 (zero creep slack in the
    strips AND the corner patch) with mass parked at the wrap-source
    CORNER — the exact region a stale/torus-evolved corner block
    contaminates (verified load-bearing: a frozen patch fails this at
    ~1e-5 by step 16)."""
    bcs = (BCType.PERIODIC, BCType.DIRICHLET, BCType.PERIODIC, BCType.NEUMANN)
    cfg = make_cfg(512, 512, bcs, out_every=16)
    tile_cfg = make_cfg(256, 256, bcs, out_every=16)
    from climate_sim_tpu.ops.pallas_stencil import pick_steps_per_pass

    assert pick_steps_per_pass(tile_cfg, 16) == 8
    u = gaussian_hotspot(cfg, jnp.float32)
    u = u + jnp.roll(
        jnp.roll(u, cfg.ny // 2 - 4, axis=0), cfg.nx // 2 - 4, axis=1
    )
    ref = oracle(u, cfg, 16)
    mesh = make_mesh(2, 2)
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None and adv.uses_slabs
    out = adv(16)(jax.device_put(u, field_sharding(mesh)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("spp", [2, 16])
def test_steps_per_pass_override_matches_oracle(spp):
    """cfg.steps_per_pass overrides the pass depth (the exchange-latency
    lever on DCN meshes, docs/performance.md): deeper and shallower passes
    must both stay exact and actually change k."""
    import dataclasses

    from climate_sim_tpu.ops.pallas_stencil import pick_steps_per_pass

    # 512^2 tiles: the extent safety floor (k <= tile/32) admits k=16.
    cfg = make_cfg(2048, 1024, MIX, out_every=16)
    cfg.steps_per_pass = spp
    tile_cfg = dataclasses.replace(cfg, nx=512, ny=512)
    assert pick_steps_per_pass(tile_cfg, 16) == spp
    mesh = make_mesh(4, 2)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 16)
    us = jax.device_put(u, field_sharding(mesh))
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    np.testing.assert_allclose(
        np.asarray(adv(16)(us)), np.asarray(ref), atol=7e-5
    )
