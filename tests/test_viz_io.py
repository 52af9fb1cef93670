"""Visualization data-access tests (reference analogue:
tests/visualization/test_io.py — every error contract + value round-trip)."""

import numpy as np
import pytest

from climate_sim_tpu.io.netcdf import NetCDFWriter
from visualization.io import list_available_steps, load_global, load_metadata


def make_snapshots(dirpath, frames, attrs=None, var="u"):
    path = str(dirpath / "snapshots.nc")
    ny, nx = frames[0].shape
    w = NetCDFWriter(path, version=5)
    w.def_dim("time", None)
    w.def_dim("y", ny)
    w.def_dim("x", nx)
    w.def_var(var, np.float64, ("time", "y", "x"))
    for k, v in (attrs or {}).items():
        w.put_gatt(k, v)
    w.enddef()
    for t, f in enumerate(frames):
        w.put_rec(var, t, f)
    w.close()
    return path


def test_missing_dir_raises():
    with pytest.raises(FileNotFoundError, match="directory not found"):
        load_global("/definitely/not/here", 0)
    with pytest.raises(FileNotFoundError):
        list_available_steps("/definitely/not/here")
    with pytest.raises(FileNotFoundError):
        load_metadata("/definitely/not/here")


def test_empty_dir_contracts(tmp_path):
    assert list_available_steps(str(tmp_path)) == []
    with pytest.raises(FileNotFoundError, match="No NetCDF file"):
        load_global(str(tmp_path), 0)
    with pytest.raises(FileNotFoundError, match="No NetCDF file"):
        load_metadata(str(tmp_path))


def test_missing_variable_keyerror(tmp_path):
    make_snapshots(tmp_path, [np.zeros((3, 4))], var="other")
    with pytest.raises(KeyError, match="'u' not found"):
        load_global(str(tmp_path), 0, var="u")


def test_no_time_dim_runtimeerror(tmp_path):
    path = str(tmp_path / "flat.nc")
    w = NetCDFWriter(path, version=2)
    w.def_dim("y", 2)
    w.def_dim("x", 2)
    w.def_var("u", np.float64, ("y", "x"))
    w.enddef()
    w.put_var("u", np.zeros((2, 2)))
    w.close()
    with pytest.raises(RuntimeError, match="No time dimension"):
        load_global(str(tmp_path), 0)
    with pytest.raises(RuntimeError):
        list_available_steps(str(tmp_path))


def test_step_out_of_range(tmp_path):
    make_snapshots(tmp_path, [np.zeros((3, 4)), np.ones((3, 4))])
    with pytest.raises(IndexError, match="out of range"):
        load_global(str(tmp_path), 2)
    with pytest.raises(IndexError):
        load_global(str(tmp_path), -1)


def test_value_roundtrip_and_steps(tmp_path):
    frames = [np.full((3, 5), float(t)) for t in range(4)]
    frames[2][1, 3] = 42.0
    make_snapshots(tmp_path, frames, attrs={"description": "x", "grid": "5 x 3"})
    assert list_available_steps(str(tmp_path)) == [0, 1, 2, 3]
    got = load_global(str(tmp_path), 2)
    assert got.dtype == np.float64
    np.testing.assert_array_equal(got, frames[2])
    meta = load_metadata(str(tmp_path))
    assert meta["description"] == "x"
    assert meta["grid"] == "5 x 3"


def test_snapshot_reader_contracts(tmp_path):
    """The one-open-handle frame source the animation exporter holds:
    values match load_global, same error contracts, idempotent close."""
    from visualization.io import SnapshotReader

    frames = [np.arange(6.0).reshape(2, 3) * (i + 1) for i in range(3)]
    make_snapshots(tmp_path, frames)
    with SnapshotReader(str(tmp_path)) as r:
        assert r.num_steps == 3
        for i, f in enumerate(frames):
            np.testing.assert_array_equal(r.frame(i), f)
            np.testing.assert_array_equal(r.frame(i), load_global(str(tmp_path), i))
        with pytest.raises(IndexError, match="out of range"):
            r.frame(3)
    r.close()  # idempotent after __exit__

    empty = tmp_path / "empty_subdir"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="No NetCDF file"):
        SnapshotReader(str(empty))
    with pytest.raises(KeyError, match="'v' not found"):
        SnapshotReader(str(tmp_path), var="v")
