"""In-process coverage of driver branches normally reached only in
subprocess/multi-host runs: distributed-init specs, the multi-host logging/
IO/timing paths (via monkeypatched ``jax.process_count``), profiling, GSPMD
fallback, and device capping.
"""

import os

import jax
import numpy as np
import pytest

from climate_sim_tpu.config import SimConfig
from climate_sim_tpu.runtime import driver as drv


@pytest.fixture(autouse=True)
def _reset_debug_nans():
    yield
    jax.config.update("jax_debug_nans", False)


# -------------------------------------------------- maybe_init_distributed


def test_distributed_spec_guard(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append((a, k)))
    monkeypatch.setattr(drv, "_distributed_spec", None)

    cfg = SimConfig()
    cfg.distributed = "auto"
    drv.maybe_init_distributed(cfg)
    assert calls == [((), {})]

    # Same spec again: no re-init.
    drv.maybe_init_distributed(cfg)
    assert len(calls) == 1

    # Different spec: loud failure, not silent drop (ADVICE round 1).
    cfg2 = SimConfig()
    cfg2.distributed = "host:1234,2,0"
    with pytest.raises(RuntimeError, match="already initialized"):
        drv.maybe_init_distributed(cfg2)


def test_distributed_explicit_spec(monkeypatch):
    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **k: calls.append(k))
    monkeypatch.setattr(drv, "_distributed_spec", None)
    cfg = SimConfig()
    cfg.distributed = "host:1234,2,1"
    drv.maybe_init_distributed(cfg)
    assert calls == [{"coordinator_address": "host:1234",
                      "num_processes": 2, "process_id": 1}]

    monkeypatch.setattr(drv, "_distributed_spec", None)
    cfg.distributed = "not-a-valid-spec"
    with pytest.raises(ValueError, match="distributed must be"):
        drv.maybe_init_distributed(cfg)


# ----------------------------------------------- multi-host code paths


def test_log_suppressed_off_controller(monkeypatch, capsys):
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    drv._log("should not appear")
    assert capsys.readouterr().out == ""


def _fake_two_processes(monkeypatch, process_index=0):
    """Fake a 2-process world on one real process: multihost_utils'
    collectives reshape jax.devices() by the real process count, so stub
    them with their single-process identities."""
    from jax.experimental import multihost_utils as mhu

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: process_index)
    monkeypatch.setattr(mhu, "process_allgather",
                        lambda x, tiled=False: np.asarray(x))
    monkeypatch.setattr(mhu, "sync_global_devices", lambda name: None)


def test_fetch_global_multihost_gather(monkeypatch):
    _fake_two_processes(monkeypatch)
    u = jax.numpy.arange(6.0).reshape(2, 3)
    got = drv.fetch_global(u)  # stubbed process_allgather path
    np.testing.assert_array_equal(got, np.arange(6.0).reshape(2, 3))


def test_run_multihost_paths_single_process(monkeypatch, tmp_path):
    """A faked 2-process world on ONE real process drives the sharded-writer
    create path, the off-controller log gate, and the MAX-over-hosts timing
    reduction — with all shards locally addressable."""
    _fake_two_processes(monkeypatch)
    cfg = SimConfig(nx=64, ny=32, D=0.05, dt=0.1, steps=4, out_every=2)
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg)
    assert res.snapshots_written == 2
    assert os.path.exists(res.output_path)
    assert res.total_time >= 0.0


def test_sharded_writer_attach_branch(monkeypatch, tmp_path):
    """Off-controller processes attach (create=False) to the header the
    controller wrote (driver.py:259-260)."""
    from climate_sim_tpu.io.snapshots import ShardedSnapshotWriter

    cfg = SimConfig(nx=32, ny=16, steps=2, out_every=1)
    cfg.output_dir = str(tmp_path / "o")
    path = cfg.resolved_output_path()
    ShardedSnapshotWriter(path, cfg, create=True, use_native=False).close()

    seen = {}
    real_ctor = ShardedSnapshotWriter.__init__

    def spy(self, path, cfg, create, use_native=True):
        seen["create"] = create
        real_ctor(self, path, cfg, create, use_native)

    _fake_two_processes(monkeypatch, process_index=1)
    monkeypatch.setattr(ShardedSnapshotWriter, "__init__", spy)
    monkeypatch.setattr(drv, "ShardedSnapshotWriter", ShardedSnapshotWriter)
    res = drv.run_simulation(cfg)
    assert seen["create"] is False
    assert res.snapshots_written == cfg.steps


# ------------------------------------------------------- other branches


def test_debug_nans_and_max_devices(tmp_path):
    cfg = SimConfig(nx=16, ny=16, steps=1, out_every=1)
    cfg.debug_nans = True
    cfg.max_devices = 1
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg)
    assert res.mesh_shape is None  # capped to one device -> no mesh
    assert bool(jax.config.jax_debug_nans) is True


def test_profile_dir_writes_trace(tmp_path):
    cfg = SimConfig(nx=16, ny=16, steps=2, out_every=1)
    cfg.profile_dir = str(tmp_path / "trace")
    cfg.output_dir = str(tmp_path / "o")
    drv.run_simulation(cfg)
    assert any(os.scandir(cfg.profile_dir)), "no trace artifacts written"


def test_partially_divisible_grid_shards_one_axis(tmp_path):
    """nx divisible / ny indivisible -> GSPMD fallback shards only the x
    axis (JAX refuses uneven explicit shardings) and still runs."""
    cfg = SimConfig(nx=16, ny=11, D=0.02, dt=0.1, steps=2, out_every=1)
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg)
    assert res.snapshots_written == 2
    assert res.mesh_shape is not None
    assert np.isfinite(np.asarray(jax.device_get(res.u))).all()


def test_fully_indivisible_grid_takes_padded_gspmd_path(tmp_path, capsys):
    """Neither axis divisible by any factorization -> padded-carrier GSPMD
    run that keeps the mesh (decision log #6's padding alternative; this
    previously degraded to a warned single-device run), end-to-end through
    snapshots, and exact vs the oracle."""
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import reference_step

    cfg = SimConfig(nx=13, ny=11, D=0.02, dt=0.1, steps=2, out_every=1)
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg)
    assert res.snapshots_written == 2
    assert res.mesh_shape is not None
    assert "padded GSPMD" in capsys.readouterr().out
    u = np.asarray(jax.device_get(res.u))
    assert np.isfinite(u).all()
    ref = gaussian_hotspot(cfg, res.u.dtype)
    for _ in range(cfg.steps):
        ref = reference_step(ref, cfg, res.dt)
    np.testing.assert_allclose(u, np.asarray(ref), atol=1e-6)


def test_overlap_flag_builds_sharded_path(tmp_path):
    """halo_overlap=true engages build_sharded_overlap_advance in prepare
    (driver.py:187-196); on CPU the Pallas probe declines and the builder
    falls back, which is exactly the fallback chain under test."""
    cfg = SimConfig(nx=128, ny=128, D=0.05, dt=0.1, steps=2, out_every=2)
    cfg.kernel = "pallas_multistep"
    cfg.halo_overlap = True
    u0, advance, mesh, dt, clamped = drv.prepare(cfg)
    assert mesh is not None
    assert callable(advance)


def test_overlap_with_one_sided_periodic_fuses(capsys):
    """halo_overlap + a one-sided-periodic BC mix now fuses at full k (the
    band kernels apply the wrap consumer patches on the exchanged wrap
    blocks), so the driver must NOT emit the old 1-step/pass cap warning
    — the combination is a first-class configuration."""
    from climate_sim_tpu.config import BCConfig, BCType

    cfg = SimConfig(nx=128, ny=128, D=0.05, dt=0.1, steps=2, out_every=2)
    cfg.kernel = "pallas_multistep"
    cfg.halo_overlap = True
    cfg.bc = BCConfig(left=BCType.DIRICHLET, right=BCType.DIRICHLET,
                      bottom=BCType.PERIODIC, top=BCType.DIRICHLET)
    drv.prepare(cfg)
    assert "1 step/pass" not in capsys.readouterr().out


def test_auto_policy_resolution(monkeypatch):
    """halo_overlap=auto / steps_per_pass=0 resolve against the mesh's DCN
    granule count (config.py field docs quote the measured policy): all-ICI
    meshes keep overlap off and the on-chip pass depth; DCN-crossing meshes
    enable overlap only for <=1024^2 shard tiles and deepen passes to 16.
    Forced true/false pass through untouched."""
    import dataclasses

    import climate_sim_tpu.parallel.mesh as pmesh
    from climate_sim_tpu.parallel.mesh import make_mesh

    cfg = SimConfig(nx=128, ny=128, D=0.05, dt=0.1, steps=2, out_every=2)
    mesh = make_mesh(4, 2)

    # all-ICI (virtual CPU mesh): overlap off, pass depth left to default
    r = drv.resolve_auto_policies(cfg, mesh)
    assert r.halo_overlap is False and r.steps_per_pass == 0
    # no mesh at all
    r = drv.resolve_auto_policies(cfg, None)
    assert r.halo_overlap is False and r.steps_per_pass == 0

    # DCN-crossing mesh (synthetic granule count)
    monkeypatch.setattr(pmesh, "dcn_granule_count", lambda devs: 2)
    r = drv.resolve_auto_policies(cfg, mesh)  # 32x64 tiles: small
    assert r.halo_overlap is True and r.steps_per_pass == 16

    big = dataclasses.replace(cfg, nx=8192, ny=8192)  # 2048x4096 tiles
    r = drv.resolve_auto_policies(big, mesh)
    assert r.halo_overlap is False and r.steps_per_pass == 16

    # one-sided-periodic mixes qualify for auto-overlap too: the band
    # kernels fuse them at full k via the wrap consumer patches (a
    # declined build still falls back to the slab path in prepare()).
    from climate_sim_tpu.config import BCConfig, BCType

    osided = dataclasses.replace(cfg)
    osided.bc = BCConfig(BCType.DIRICHLET, BCType.DIRICHLET,
                         BCType.PERIODIC, BCType.DIRICHLET)
    r = drv.resolve_auto_policies(osided, mesh)
    assert r.halo_overlap is True and r.steps_per_pass == 16

    # forced values and explicit depth pass through
    forced = dataclasses.replace(big, halo_overlap=True, steps_per_pass=8)
    r = drv.resolve_auto_policies(forced, mesh)
    assert r.halo_overlap is True and r.steps_per_pass == 8
    off = dataclasses.replace(cfg, halo_overlap=False)
    assert drv.resolve_auto_policies(off, mesh).halo_overlap is False


def test_single_device_misaligned_grid_takes_carrier(tmp_path, capsys):
    """SINGLE-CHIP misaligned grids engage the padded-carrier path on a
    1x1 mesh (r05): shapes like 250x1252 decline every fused/assembled
    single-device layout and previously fell to jnp-class rates
    (52-127 Gpt/s measured vs the carrier's 170-176).  End-to-end
    through snapshots and exact vs the oracle; aligned grids keep the
    plain single-device fused path (no carrier, no mesh banner)."""
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import reference_step

    cfg = SimConfig(nx=250, ny=1080, D=0.02, dt=0.1, steps=2, out_every=1)
    cfg.kernel = "pallas_multistep"
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg, devices=jax.devices()[:1])
    out = capsys.readouterr().out
    assert "CARRIER path" in out and "on this chip" in out
    assert res.snapshots_written == 2
    assert res.mesh_shape is None  # still a single-device run
    u = np.asarray(jax.device_get(res.u))
    assert u.shape == (cfg.ny, cfg.nx)
    ref = gaussian_hotspot(cfg, res.u.dtype)
    for _ in range(cfg.steps):
        ref = reference_step(ref, cfg, res.dt)
    np.testing.assert_allclose(u, np.asarray(ref), atol=5e-5)

    # aligned single-device grid: carrier declines, fused path serves
    cfg2 = SimConfig(nx=256, ny=128, D=0.02, dt=0.1, steps=2, out_every=2)
    cfg2.kernel = "pallas_multistep"
    u0, advance, mesh, dt, clamped = drv.prepare(
        cfg2, devices=jax.devices()[:1]
    )
    assert mesh is None and not hasattr(advance, "embed")
