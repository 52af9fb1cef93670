"""Initial-condition tests (reference analogue: test_init.cpp:47-95)."""

import numpy as np
import jax.numpy as jnp
import pytest

from climate_sim_tpu.config import SimConfig
from climate_sim_tpu.io.netcdf import NetCDFWriter
from climate_sim_tpu.ops import apply_initial_condition
from oracle import gaussian_ic


def test_constant_zero():
    cfg = SimConfig(nx=16, ny=8)
    cfg.ic.preset = "constant_zero"
    u = np.asarray(apply_initial_condition(cfg, jnp.float64))
    assert u.shape == (8, 16)
    assert np.all(u == 0.0)


def test_gaussian_matches_reference_formula():
    cfg = SimConfig(nx=64, ny=32, dx=0.5, dy=1.5)
    cfg.ic.A = 2.0
    cfg.ic.sigma_frac = 0.1
    cfg.ic.xc_frac = 0.25
    cfg.ic.yc_frac = 0.75
    u = np.asarray(apply_initial_condition(cfg, jnp.float64))
    expect = gaussian_ic(64, 32, 0.5, 1.5, 2.0, 0.1, 0.25, 0.75)
    np.testing.assert_allclose(u, expect, rtol=0, atol=1e-12)
    assert u.max() > 1e-6  # nonzero (reference: test_init.cpp gaussian case)


def test_unknown_preset_raises():
    cfg = SimConfig()
    cfg.ic.preset = "nope"
    with pytest.raises(ValueError, match="Unknown IC preset: nope"):
        apply_initial_condition(cfg)


def test_unknown_mode_raises():
    cfg = SimConfig()
    cfg.ic.mode = "wat"
    with pytest.raises(ValueError, match="Unknown IC mode"):
        apply_initial_condition(cfg)


def test_file_ic_roundtrip(tmp_path):
    """File IC is implemented for real (the reference throws,
    init.cpp:44-46; decision log #2)."""
    path = str(tmp_path / "ic.nc")
    data = gaussian_ic(20, 10)
    w = NetCDFWriter(path, version=2)
    w.def_dim("y", 10)
    w.def_dim("x", 20)
    w.def_var("u", np.float64, ("y", "x"))
    w.enddef()
    w.put_var("u", data)
    w.close()

    cfg = SimConfig(nx=20, ny=10)
    cfg.ic.mode = "file"
    cfg.ic.path = path
    u = np.asarray(apply_initial_condition(cfg, jnp.float64))
    np.testing.assert_allclose(u, data, rtol=0, atol=0)


def test_file_ic_restart_from_snapshots(tmp_path):
    """3D (time,y,x) files restart from the LAST record — checkpoint/resume."""
    path = str(tmp_path / "snaps.nc")
    w = NetCDFWriter(path, version=5)
    w.def_dim("time", None)
    w.def_dim("y", 4)
    w.def_dim("x", 6)
    w.def_var("u", np.float64, ("time", "y", "x"))
    w.enddef()
    w.put_rec("u", 0, np.zeros((4, 6)))
    last = np.arange(24, dtype=np.float64).reshape(4, 6)
    w.put_rec("u", 1, last)
    w.close()

    cfg = SimConfig(nx=6, ny=4)
    cfg.ic.mode = "file"
    cfg.ic.path = path
    u = np.asarray(apply_initial_condition(cfg, jnp.float64))
    np.testing.assert_array_equal(u, last)


def test_file_ic_errors(tmp_path):
    cfg = SimConfig(nx=8, ny=8)
    cfg.ic.mode = "file"
    cfg.ic.path = ""
    with pytest.raises(ValueError, match="requires ic.path"):
        apply_initial_condition(cfg)

    cfg.ic.path = str(tmp_path / "missing.nc")
    with pytest.raises(FileNotFoundError):
        apply_initial_condition(cfg)

    # wrong shape
    path = str(tmp_path / "bad.nc")
    w = NetCDFWriter(path, version=2)
    w.def_dim("y", 3)
    w.def_dim("x", 3)
    w.def_var("u", np.float64, ("y", "x"))
    w.enddef()
    w.put_var("u", np.zeros((3, 3)))
    w.close()
    cfg.ic.path = path
    with pytest.raises(ValueError, match="does not match grid"):
        apply_initial_condition(cfg)

    # missing variable
    cfg2 = SimConfig(nx=3, ny=3)
    cfg2.ic.mode = "file"
    cfg2.ic.path = path
    cfg2.ic.var = "missing"
    with pytest.raises(KeyError):
        apply_initial_condition(cfg2)


def test_restart_from_hdf5_3d_last_record(tmp_path):
    """A NETCDF4-family (HDF5) snapshot stack restarts from its LAST record,
    matching the classic-file restart contract — the reference ecosystem's
    IC files (generate_ic.py:23) are this format family."""
    import h5py
    import jax.numpy as jnp

    from climate_sim_tpu.config import SimConfig
    from climate_sim_tpu.ops.init import apply_initial_condition

    rng = np.random.default_rng(7)
    frames = rng.normal(size=(3, 10, 14))
    path = str(tmp_path / "stack.nc")
    with h5py.File(path, "w") as f:
        f.create_dataset("u", data=frames)

    cfg = SimConfig(nx=14, ny=10)
    cfg.ic.mode = "file"
    cfg.ic.path = path
    got = np.asarray(apply_initial_condition(cfg, jnp.float64))
    np.testing.assert_array_equal(got, frames[-1])


def test_hdf5_missing_var_and_bad_magic(tmp_path):
    import h5py
    import jax.numpy as jnp

    from climate_sim_tpu.config import SimConfig
    from climate_sim_tpu.ops.init import apply_initial_condition

    path = str(tmp_path / "novar.nc")
    with h5py.File(path, "w") as f:
        f.create_dataset("other", data=np.zeros((4, 4)))
    cfg = SimConfig(nx=4, ny=4)
    cfg.ic.mode = "file"
    cfg.ic.path = path
    with pytest.raises(KeyError):
        apply_initial_condition(cfg, jnp.float64)

    junk = str(tmp_path / "junk.nc")
    open(junk, "wb").write(b"not a netcdf file")
    cfg.ic.path = junk
    with pytest.raises(ValueError, match="not a NetCDF file"):
        apply_initial_condition(cfg, jnp.float64)


def test_file_ic_truncated_snapshot_refused(tmp_path):
    """A snapshot truncated mid-record must be REFUSED with a clear error,
    not silently restarted from half-zeroed state (netCDF read semantics
    zero-fill missing tail bytes; the restart layer must not inherit
    that).  The reference's no-partial-data contract,
    integration_boundary_error.cpp:22-46."""
    import os

    import climate_sim_tpu.runtime.driver as drv

    cfg = SimConfig(nx=64, ny=32, D=0.02, dt=0.1, steps=4, out_every=2)
    cfg.output_dir = str(tmp_path / "o")
    res = drv.run_simulation(cfg)
    path = res.output_path
    with open(path, "r+b") as f:
        f.truncate(os.path.getsize(path) - (64 * 32 * 8) // 2)

    cfg2 = SimConfig(nx=64, ny=32, D=0.02, dt=0.1, steps=2, out_every=1)
    cfg2.ic.mode = "file"
    cfg2.ic.path = path
    with pytest.raises(ValueError, match="truncated"):
        apply_initial_condition(cfg2)

    # through the CLI: runtime error -> exit 1, no partial output
    from climate_sim_tpu.runtime.cli import main as cli_main

    out2 = tmp_path / "o2"
    rc = cli_main([
        "--nx=64", "--ny=32", "--steps=2", "--out_every=1",
        "--ic.mode=file", "--ic.path=" + path,
        "--output.dir=" + str(out2),
    ])
    assert rc == 1
    assert not (out2 / "snapshots.nc").exists()


def test_file_ic_truncated_2d_refused(tmp_path):
    """The truncation guard also covers plain 2D (y,x) classic ICs and
    fixed-time-dim files — not just record variables (review finding)."""
    import os

    path = str(tmp_path / "ic2d.nc")
    w = NetCDFWriter(path, version=5)
    w.def_dim("y", 32)
    w.def_dim("x", 64)
    w.def_var("u", np.float64, ("y", "x"))
    w.enddef()
    w.put_var("u", np.random.default_rng(0).random((32, 64)))
    w.close()
    cfg = SimConfig(nx=64, ny=32)
    cfg.ic.mode = "file"
    cfg.ic.path = path
    apply_initial_condition(cfg)  # intact: reads fine
    with open(path, "r+b") as f:
        f.truncate(os.path.getsize(path) - 64)
    with pytest.raises(ValueError, match="truncated"):
        apply_initial_condition(cfg)
