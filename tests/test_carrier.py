"""Padded-carrier Pallas path: grids indivisible (or tile-misaligned) on the
mesh run the slab kernel on a mesh-uniform zero-padded carrier, with the true
physical edges at runtime tile positions (masked-select fixups) and periodic
wrap staged into the pads.

The reference handles the same grids with unequal last-rank tiles
(reference: src/decomp.cpp:29-30); shard_map needs uniform shards, so the
carrier + runtime-edge design is the TPU-native equivalent.  Runs on the
virtual 8-device CPU mesh (conftest) with the kernel in interpret mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climate_sim_tpu.config import BCConfig, BCType, SimConfig
from climate_sim_tpu.ops.init import gaussian_hotspot
from climate_sim_tpu.ops.step import reference_step
from climate_sim_tpu.parallel.halo import (
    _carrier_axis_plan,
    build_carrier_slab_advance,
)
from climate_sim_tpu.parallel.mesh import make_mesh

D4 = (BCType.DIRICHLET,) * 4
N4 = (BCType.NEUMANN,) * 4
P4 = (BCType.PERIODIC,) * 4
MIX = (BCType.DIRICHLET, BCType.NEUMANN, BCType.DIRICHLET, BCType.NEUMANN)


def make_cfg(nx, ny, bcs, out_every=8, compat=False):
    cfg = SimConfig(
        nx=nx, ny=ny, D=0.05, vx=0.5, vy=-0.25, dt=0.1, steps=16,
        out_every=out_every,
    )
    cfg.bc = BCConfig(*bcs)
    cfg.strict_reference_compat = compat
    return cfg


def oracle(u, cfg, steps):
    for _ in range(steps):
        u = reference_step(u, cfg, cfg.dt)
    return u


def run_carrier(cfg, mesh_shape, steps):
    px, py = mesh_shape
    mesh = make_mesh(px, py, jax.devices()[: px * py])
    adv = build_carrier_slab_advance(cfg, mesh, cfg.dt, interpret=True)
    if adv is None:
        return None
    u = gaussian_hotspot(cfg, jnp.float32)
    c = adv.embed(u)
    assert c.shape == adv.carrier_shape
    c = adv(steps)(c)
    return np.asarray(adv.extract(c)), np.asarray(oracle(u, cfg, steps))


def test_axis_plan_geometry():
    # divisible + aligned: no pad
    assert _carrier_axis_plan(1024, 4, "none", 128) == (256, 3, 256)
    # indivisible: next 128-multiple of ceil(1000/4)=250 -> 256
    assert _carrier_axis_plan(1000, 4, "none", 128) == (256, 3, 232)
    # divisible but MISALIGNED tiles (500 % 128 != 0) also get a carrier
    m, e, l = _carrier_axis_plan(1000, 2, "none", 128)
    assert m % 128 == 0 and e * m < 1000 <= (e + 1) * m and l == 1000 - e * m
    # rounding may push the edge off the last shard (non-periodic is fine
    # with trailing all-pad shards)
    m, e, l = _carrier_axis_plan(36, 4, "none", 8)
    assert (m, e, l) == (16, 2, 4)
    # periodic needs >= 16 pad lines and >= 8 true lines in the edge shard
    m, e, l = _carrier_axis_plan(1000, 2, "two", 8)
    assert e == 1 and 2 * m - 1000 >= 16 and l >= 8
    # single-shard aligned periodic axis: no pad (self-exchange wraps)
    assert _carrier_axis_plan(1000, 1, "two", 8) == (1000, 0, 1000)
    # single-shard MISALIGNED periodic axis: pad >= 16 beyond the extent
    m, e, l = _carrier_axis_plan(1000, 1, "two", 128)
    assert (e, l) == (0, 1000) and m - 1000 >= 16 and m % 128 == 0


@pytest.mark.parametrize("mesh_shape", [(4, 2), (2, 4)])
@pytest.mark.parametrize("bcs", [D4, N4, MIX])
def test_carrier_indivisible_both_axes_matches_oracle(mesh_shape, bcs):
    """The VERDICT target case: 1000x1000 (indivisible along both axes of
    every 8-device mesh) runs the slab kernel via the carrier and matches
    the oracle."""
    cfg = make_cfg(1000, 1000, bcs)
    got = run_carrier(cfg, mesh_shape, 16)
    assert got is not None, "carrier path unavailable"
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


def test_carrier_periodic_both_axes_matches_oracle():
    """Two-sided periodic on both padded axes: wrap-head + tail-mirror
    staging keeps the torus exact across shard seams AND the pad seam."""
    cfg = make_cfg(1000, 1000, P4)
    got = run_carrier(cfg, (4, 2), 16)
    assert got is not None
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


def test_carrier_periodic_single_shard_axis():
    """px==1 periodic with a padded x axis: the tail-mirror must be staged
    even though the cyclic exchange is the identity — the left ghost slab
    sources from the tile's LAST columns, which are pad without it (the
    hardware conformance matrix caught this; regression)."""
    cfg = make_cfg(1000, 504, P4)
    got = run_carrier(cfg, (1, 1), 16)
    assert got is not None
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


def test_carrier_periodic_y_only_padded():
    """Periodic y + non-periodic x, y axis padded, x axis aligned."""
    cfg = make_cfg(
        1024, 1000,
        (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.PERIODIC),
    )
    got = run_carrier(cfg, (4, 2), 16)
    assert got is not None
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


def test_carrier_partially_divisible():
    """One axis divisible+aligned, the other indivisible."""
    cfg = make_cfg(1000, 1024, MIX)
    got = run_carrier(cfg, (2, 4), 16)
    assert got is not None
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


def test_carrier_compat_mode():
    """strict_reference_compat: periodic sides reproduce the reference's
    stale-zero no-op at the TRUE edges, not the carrier edges."""
    cfg = make_cfg(1000, 1000, P4, compat=True)
    got = run_carrier(cfg, (4, 2), 16)
    assert got is not None
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


def test_carrier_chunk_remainder():
    """Chunks that are not multiples of k exercise remainder passes."""
    cfg = make_cfg(1000, 504, MIX)
    got = run_carrier(cfg, (4, 2), 11)
    assert got is not None
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


ONE_SIDED = [
    # every orientation of the reference's dev.yaml-style one-sided mixes
    (BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN, BCType.NEUMANN),
    (BCType.DIRICHLET, BCType.PERIODIC, BCType.NEUMANN, BCType.DIRICHLET),
    (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET),
    (BCType.NEUMANN, BCType.DIRICHLET, BCType.DIRICHLET, BCType.PERIODIC),
    # both axes one-sided at once
    (BCType.PERIODIC, BCType.DIRICHLET, BCType.DIRICHLET, BCType.PERIODIC),
    (BCType.DIRICHLET, BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET),
]


@pytest.mark.parametrize("bcs", ONE_SIDED)
def test_carrier_one_sided_periodic_matches_oracle(bcs):
    """One-sided-periodic mixes on indivisible grids run the Pallas carrier
    at full k (previously the one rejected envelope cell, ~7x slower on the
    padded-GSPMD jnp path): the staged wrap block's outer line is re-pinned
    to the opposite side's BC by the in-kernel consumer patch
    (wrap_*_mask), so the block evolves with the one-sided semantics the
    oracle defines (reference: any-shape x any-BC envelope,
    decomp.cpp:29-30 + boundary.cpp:12-54)."""
    cfg = make_cfg(1000, 504, bcs)
    got = run_carrier(cfg, (4, 2), 16)
    assert got is not None, "carrier declined a one-sided-periodic grid"
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


@pytest.mark.parametrize("mesh_shape", [(2, 4), (1, 8), (8, 1)])
def test_carrier_one_sided_periodic_mesh_shapes(mesh_shape):
    """One-sided wrap staging across different mesh factorizations (the
    head ppermute targets the edge shard, which needs not be the last)."""
    cfg = make_cfg(1000, 504,
                   (BCType.DIRICHLET, BCType.PERIODIC,
                    BCType.PERIODIC, BCType.NEUMANN))
    got = run_carrier(cfg, mesh_shape, 16)
    assert got is not None
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


def test_carrier_rejects_aligned_divisible():
    """Divisible + aligned grids must use the standard fast path."""
    cfg = make_cfg(1024, 1024, D4)
    mesh = make_mesh(4, 2)
    assert build_carrier_slab_advance(cfg, mesh, cfg.dt, interpret=True) is None


def test_carrier_rejects_tiny_grids():
    cfg = make_cfg(13, 11, D4)
    mesh = make_mesh(4, 2)
    assert build_carrier_slab_advance(cfg, mesh, cfg.dt, interpret=True) is None


def test_driver_runs_carrier_path_end_to_end(tmp_path, capsys):
    """run_simulation keeps the carrier as loop state, snapshots the true
    extent, and matches the oracle (the indivisible-grid analogue of the
    reference's any-shape decomposition, decomp.cpp:29-30)."""
    import climate_sim_tpu.runtime.driver as drv

    cfg = make_cfg(1000, 504, MIX, out_every=4)
    cfg.steps = 8
    cfg.kernel = "pallas_multistep"
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg)
    assert "CARRIER path" in capsys.readouterr().out
    assert res.snapshots_written == 2
    assert res.mesh_shape is not None
    u = np.asarray(jax.device_get(res.u))
    assert u.shape == (504, 1000)
    ref = np.asarray(oracle(gaussian_hotspot(cfg, res.u.dtype), cfg, 8))
    np.testing.assert_allclose(u, ref, atol=5e-5)
    # snapshot file carries the true extent
    from climate_sim_tpu.io.netcdf import NetCDFFile

    f = NetCDFFile(res.output_path)
    assert f.variables["u"].shape == (2, 504, 1000)
    np.testing.assert_allclose(f.variables["u"][0], np.asarray(
        gaussian_hotspot(cfg, res.u.dtype)), atol=1e-6)


def test_driver_warns_on_jnp_downgrade(tmp_path, capsys):
    """A Pallas request that no layout can serve must WARN (not just info)
    that the run is jnp-class (ADVICE round 2)."""
    import climate_sim_tpu.runtime.driver as drv

    cfg = SimConfig(nx=13, ny=11, D=0.02, dt=0.1, steps=2, out_every=1)
    cfg.kernel = "pallas_multistep"
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg)
    err = capsys.readouterr().err
    assert "[warn]" in err and "jnp-class" in err
    assert res.snapshots_written == 2


def test_carrier_fuzz_random_geometries(rng):
    """Seeded sweep of random (grid, mesh, BC, steps) carrier configs vs
    the oracle — the geometry planner has many branches (pad on one/both
    axes, staging windows, edge-shard placement) and each divides the
    input space."""
    kinds = [BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC]
    meshes = [(4, 2), (2, 4), (2, 2), (1, 8), (8, 1), (1, 1), (2, 1)]
    tried = 0
    for trial in range(18):
        px, py = meshes[rng.integers(len(meshes))]
        nx = int(rng.integers(150 * px, 300 * px))
        ny = int(rng.integers(40 * py, 90 * py))
        # one-sided periodic mixes included: first-class since r04 (wrap
        # consumer patches) — the r03-era avoidance here was stale
        bcs = [kinds[rng.integers(3)] for _ in range(4)]
        steps = int(rng.integers(3, 14))
        cfg = make_cfg(nx, ny, tuple(bcs), out_every=8,
                       compat=bool(rng.integers(4) == 0))
        got = run_carrier(cfg, (px, py), steps)
        if got is None:
            continue
        tried += 1
        np.testing.assert_allclose(
            got[0], got[1], atol=7e-5,
            err_msg=f"trial={trial} grid={nx}x{ny} mesh=({px},{py}) "
                    f"bcs={bcs} steps={steps} compat={cfg.strict_reference_compat}",
        )
    assert tried >= 6, f"fuzz exercised only {tried} carrier configs"


def test_carrier_restart_from_own_snapshot(tmp_path):
    """Restart an indivisible-grid run from its own snapshot: the file-IC
    read feeds the carrier embed, and two 4-step runs chained through a
    snapshot match one 8-step run exactly (pass-grouping aligned).

    NB: configs are built FRESH per run — ``dataclasses.replace`` copies
    are shallow, so mutating ``cfg.ic`` on one would alias them all."""
    import climate_sim_tpu.runtime.driver as drv

    def fresh(steps):
        cfg = make_cfg(1000, 504, MIX, out_every=4)
        cfg.kernel = "pallas_multistep"
        cfg.steps = steps
        return cfg

    cfg1 = fresh(4)
    cfg1.write_final = True
    cfg1.output_dir = str(tmp_path / "a")
    res1 = drv.run_simulation(cfg1)

    cfg2 = fresh(4)
    cfg2.output_dir = str(tmp_path / "b")
    cfg2.ic.mode = "file"
    cfg2.ic.path = res1.output_path  # last record = post-step-4 state
    res2 = drv.run_simulation(cfg2)

    cfg3 = fresh(8)
    cfg3.output_dir = str(tmp_path / "c")
    res3 = drv.run_simulation(cfg3)

    np.testing.assert_allclose(
        np.asarray(jax.device_get(res2.u)),
        np.asarray(jax.device_get(res3.u)),
        atol=1e-6,
    )


@pytest.mark.parametrize("bcs", [MIX, P4,
                                 (BCType.DIRICHLET, BCType.PERIODIC,
                                  BCType.PERIODIC, BCType.NEUMANN)])
def test_carrier_steps_per_pass_16(bcs):
    """steps_per_pass=16 raises the carrier staging depth to KH=16 (the
    DCN auto-depth): 16-line wrap blocks, 16-wide slab exchange, and
    remainder passes on the same KH-16 layout — all vs the oracle."""
    cfg = make_cfg(1000, 504, bcs)
    cfg.steps_per_pass = 16
    got = run_carrier(cfg, (4, 2), 19)  # 16 + remainder 3
    assert got is not None, "carrier declined at KH=16"
    np.testing.assert_allclose(got[0], got[1], atol=5e-5)


@pytest.mark.parametrize("bcs", [MIX, P4])
def test_carrier_by_friendly_height_expansion(bcs):
    """r05 BY-friendliness expansion: a carrier height whose divisor
    structure is hostile to the measured-best BY band (ny=1252 -> my=1256
    = 8x313, only divisor 8 -> 24-row windows, ~67% halo-redundant
    compute) is padded up a few extra rows to the first height with a
    band divisor (1280, +2.2%) — and stays oracle-exact, torus staging
    included (docs/performance.md "CARRIER BY BAND")."""
    cfg = make_cfg(256, 1252, bcs)
    got_ref = run_carrier(cfg, (1, 1), 8)
    assert got_ref is not None
    got, ref = got_ref
    np.testing.assert_allclose(got, ref, atol=5e-5)

    mesh = make_mesh(1, 1, jax.devices()[:1])
    adv = build_carrier_slab_advance(cfg, mesh, cfg.dt, interpret=True)
    ncy, _ = adv.carrier_shape
    assert ncy == 1280, f"expected BY-friendly height 1280, got {ncy}"


def test_carrier_expansion_skipped_when_band_divisor_exists():
    """Heights that already have a band divisor are NOT padded further
    (ny=1080: 120 divides it)."""
    cfg = make_cfg(250, 1080, MIX)
    mesh = make_mesh(1, 1, jax.devices()[:1])
    adv = build_carrier_slab_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    assert adv.carrier_shape[0] == 1080


def test_carrier_expansion_skipped_above_band_floor():
    """Heights whose best divisor is >= 120 (e.g. ny=1000: BY=200) are
    NOT expanded — measured flat-to-worse (2000²: 170.5 unexpanded vs
    167.8 expanded; 5000²: a wash), so the policy expands only below
    the band floor."""
    cfg = make_cfg(250, 1000, MIX)
    mesh = make_mesh(1, 1, jax.devices()[:1])
    adv = build_carrier_slab_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    assert adv.carrier_shape[0] == 1000


def test_carrier_carries_bf16_storage_mode():
    """bf16 x carrier (r05): misaligned bf16 grids previously had NO
    carrier (the build hardcoded the f32 8-row staging/alignment
    quantum) and fell to jnp-class fallbacks.  The carrier now rounds
    KH / y-alignment / BY candidates to the 16-row bf16 tile; error vs
    the f32 oracle from the same cast IC stays at the
    one-rounding-per-pass scale.  Includes a grid that is 8-row- but
    not 16-row-aligned (bf16 carrier territory that f32 calls aligned);
    the torus row exercises KH=16 wrap staging under bf16."""
    for ny, bcs in ((504, MIX), (1000, MIX), (504, P4)):
        cfg = make_cfg(1000, ny, bcs)
        mesh = make_mesh(1, 1, jax.devices()[:1])
        adv = build_carrier_slab_advance(
            cfg, mesh, cfg.dt, interpret=True, dtype_name="bfloat16"
        )
        assert adv is not None, f"bf16 carrier declined at ny={ny}"
        assert adv.carrier_shape[0] % 16 == 0
        u = gaussian_hotspot(cfg, jnp.bfloat16)
        got = np.asarray(
            adv.extract(adv(8)(adv.embed(u))), np.float32
        )
        ref = jnp.asarray(u, jnp.float32)
        for _ in range(8):
            ref = reference_step(ref, cfg, cfg.dt)
        d = np.abs(got - np.asarray(ref)).max()
        assert d < 1.6e-2, f"bf16 carrier error too large at ny={ny}: {d}"
