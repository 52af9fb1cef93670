"""Native (C++) CDF-5 async writer tests.

The native writer must produce byte-identical files to the pure-Python
codec for the snapshot schema (reference: src/io.cpp:378-448), through both
the raw binding and the SnapshotWriter front-end.
"""


import numpy as np
import pytest

from climate_sim_tpu.config import SimConfig
from climate_sim_tpu.io.netcdf import NetCDFFile, NetCDFWriter
from climate_sim_tpu.io.snapshots import SnapshotWriter, metadata_attrs

native = pytest.importorskip("climate_sim_tpu.io.native")


def python_reference_file(path, cfg, frames):
    w = NetCDFWriter(path, version=5)
    w.def_dim("time", None)
    w.def_dim("y", cfg.ny)
    w.def_dim("x", cfg.nx)
    w.def_var("u", np.float64, ("time", "y", "x"))
    for k, v in metadata_attrs(cfg).items():
        w.put_gatt(k, v)
    w.enddef()
    for i, f in enumerate(frames):
        w.put_rec("u", i, f)
    w.close()


def test_byte_identical_to_python_codec(tmp_path, rng):
    cfg = SimConfig(nx=48, ny=24)
    frames = [rng.normal(size=(24, 48)) for _ in range(4)]
    npath = str(tmp_path / "native.nc")
    ppath = str(tmp_path / "python.nc")
    w = native.NativeSnapshotWriter(npath, cfg, metadata_attrs(cfg))
    for i, f in enumerate(frames):
        w.append(i, f)
    w.close()
    python_reference_file(ppath, cfg, frames)
    with open(npath, "rb") as fa, open(ppath, "rb") as fb:
        assert fa.read() == fb.read()


def test_roundtrip_values_and_attrs(tmp_path, rng):
    cfg = SimConfig(nx=32, ny=16, D=0.25, vx=-1.5, vy=0.75, dt=0.05, steps=7)
    frames = [rng.normal(size=(16, 32)) for _ in range(2)]
    path = str(tmp_path / "rt.nc")
    with native.NativeSnapshotWriter(path, cfg, metadata_attrs(cfg)) as w:
        for i, f in enumerate(frames):
            w.append(i, f)
        w.flush()
    with NetCDFFile(path) as ds:
        assert ds.dimensions == {"time": 2, "y": 16, "x": 32}
        assert ds.getncattr("D") == "0.250000"
        assert ds.getncattr("velocity") == "(-1.500000,0.750000)"
        np.testing.assert_array_equal(ds.variables["u"][1, :, :], frames[1])


def test_snapshot_writer_native_vs_python(tmp_path, rng):
    """SnapshotWriter(use_native=...) must be behavior-identical both ways."""
    cfg = SimConfig(nx=40, ny=20)
    frames = [rng.normal(size=(20, 40)) for _ in range(3)]
    paths = {}
    for use_native in (True, False):
        p = str(tmp_path / f"snap_{use_native}.nc")
        w = SnapshotWriter(p, cfg, use_native=use_native)
        if use_native:
            assert w._native is not None, "native writer should be available"
        for f in frames:
            w.write(f)
        w.close()
        paths[use_native] = p
    with open(paths[True], "rb") as fa, open(paths[False], "rb") as fb:
        assert fa.read() == fb.read()


def test_out_of_order_and_sparse_records(tmp_path, rng):
    """Records written out of order: numrecs tracks the max; the gap reads
    back zero-filled (classic-netCDF unwritten-record semantics)."""
    cfg = SimConfig(nx=16, ny=8)
    f0 = rng.normal(size=(8, 16))
    f2 = rng.normal(size=(8, 16))
    path = str(tmp_path / "sparse.nc")
    with native.NativeSnapshotWriter(path, cfg, metadata_attrs(cfg)) as w:
        w.append(2, f2)
        w.append(0, f0)
    with NetCDFFile(path) as ds:
        assert ds.dimensions["time"] == 3
        np.testing.assert_array_equal(ds.variables["u"][0, :, :], f0)
        np.testing.assert_array_equal(ds.variables["u"][2, :, :], f2)


def test_bad_path_raises():
    cfg = SimConfig(nx=8, ny=8)
    with pytest.raises(RuntimeError, match="ncw_create failed"):
        native.NativeSnapshotWriter("/nonexistent-dir/x.nc", cfg, {})


def test_shape_mismatch_raises(tmp_path):
    cfg = SimConfig(nx=8, ny=8)
    w = native.NativeSnapshotWriter(str(tmp_path / "s.nc"), cfg, {})
    with pytest.raises(ValueError, match="frame shape"):
        w.append(0, np.zeros((4, 4)))
    w.close()


def test_many_frames_async_drain(tmp_path, rng):
    """More frames than the bounded queue: appends block-and-drain, close
    leaves every record on disk."""
    cfg = SimConfig(nx=128, ny=64)
    frames = [rng.normal(size=(64, 128)) for _ in range(12)]
    path = str(tmp_path / "deep.nc")
    with native.NativeSnapshotWriter(path, cfg, metadata_attrs(cfg)) as w:
        for i, f in enumerate(frames):
            w.append(i, f)
    with NetCDFFile(path) as ds:
        assert ds.dimensions["time"] == 12
        for i in (0, 5, 11):
            np.testing.assert_array_equal(ds.variables["u"][i, :, :], frames[i])


def test_native_region_writes_byte_identical(tmp_path, rng):
    """A record assembled from async native hyperslab appends (out-of-order
    tiles, create+attach handles) is byte-identical to a whole-record write
    through the Python codec (ncmpi_put_vara_double_all analogue)."""
    cfg = SimConfig(nx=24, ny=12)
    attrs = metadata_attrs(cfg)
    frames = [rng.normal(size=(12, 24)) for _ in range(2)]

    ref = str(tmp_path / "ref.nc")
    w = NetCDFWriter(ref, version=5)
    w.def_dim("time", None)
    w.def_dim("y", 12)
    w.def_dim("x", 24)
    w.def_var("u", np.float64, ("time", "y", "x"))
    for k, v in attrs.items():
        w.put_gatt(k, v)
    w.enddef()
    for t, f in enumerate(frames):
        w.put_rec("u", t, f)
    w.close()

    tiled = str(tmp_path / "tiled.nc")
    creator = native.NativeSnapshotWriter(tiled, cfg, attrs, create=True)
    attacher = native.NativeSnapshotWriter(tiled, cfg, attrs, create=False)
    for t, f in enumerate(frames):
        creator.append_region(t, 6, 8, f[6:, 8:])    # bottom-right, ragged
        attacher.append_region(t, 0, 0, f[:6, :])    # top band (full width)
        creator.append_region(t, 6, 0, f[6:, :8])    # bottom-left
    attacher.close()
    creator.close()

    assert open(tiled, "rb").read() == open(ref, "rb").read()


def test_native_attach_header_mismatch(tmp_path):
    cfg = SimConfig(nx=8, ny=8)
    path = str(tmp_path / "h.nc")
    w = native.NativeSnapshotWriter(path, cfg, metadata_attrs(cfg))
    w.close()
    other = SimConfig(nx=8, ny=16)
    with pytest.raises(RuntimeError, match="attach failed"):
        native.NativeSnapshotWriter(path, other, metadata_attrs(other), create=False)


def test_native_region_bounds(tmp_path, rng):
    cfg = SimConfig(nx=8, ny=8)
    w = native.NativeSnapshotWriter(str(tmp_path / "b.nc"), cfg, metadata_attrs(cfg))
    with pytest.raises(RuntimeError, match="out of bounds"):
        w.append_region(0, 6, 0, np.zeros((4, 8)))
    w.close()


def test_disk_full_mid_region_write_propagates(tmp_path, rng):
    """A write error in the BACKGROUND queue thread (simulated disk-full:
    the writer's fd is atomically redirected to /dev/full mid-stream) must
    surface as a raised error on a later append/flush/close — never vanish
    (the reference's no-partial-output contract,
    integration_boundary_error.cpp:22-46)."""
    import os

    cfg = SimConfig(nx=256, ny=256, steps=4, out_every=1)
    path = str(tmp_path / "full.nc")
    w = native.NativeSnapshotWriter(path, cfg, metadata_attrs(cfg))
    frame = rng.random((cfg.ny, cfg.nx))
    w.append_region(0, 0, 0, frame)
    w.flush()  # first frame lands on the real file

    # Redirect the writer's fd to /dev/full: every subsequent kernel write
    # fails with ENOSPC, exactly like a filled-up disk.
    target = os.path.realpath(path)
    writer_fd = None
    for fd in os.listdir("/proc/self/fd"):
        try:
            if os.path.realpath(f"/proc/self/fd/{fd}") == target:
                writer_fd = int(fd)
        except OSError:
            continue
    if writer_fd is None:
        pytest.skip("writer fd not discoverable on this platform")
    full = os.open("/dev/full", os.O_WRONLY)
    try:
        os.dup2(full, writer_fd)
    finally:
        os.close(full)

    with pytest.raises(RuntimeError):
        # The failure may be detected at an enqueue (bounded queue), at
        # flush, or at close — but it MUST be detected.
        for i in range(1, 8):
            w.append_region(i, 0, 0, frame)
            w.flush()
        w.close()
    # A close after the error still reports it (never swallows), and a
    # second close is an idempotent no-op.
    try:
        w.close()
    except RuntimeError:
        pass
    w.close()


def test_flush_error_not_swallowed(tmp_path, rng):
    """fflush hitting ENOSPC (buffered bytes that never reached disk) must
    raise from flush() — unchecked fflush loses the tail silently."""
    import os

    cfg = SimConfig(nx=64, ny=64, steps=1, out_every=1)
    path = str(tmp_path / "tail.nc")
    w = native.NativeSnapshotWriter(path, cfg, metadata_attrs(cfg))
    target = os.path.realpath(path)
    writer_fd = None
    for fd in os.listdir("/proc/self/fd"):
        try:
            if os.path.realpath(f"/proc/self/fd/{fd}") == target:
                writer_fd = int(fd)
        except OSError:
            continue
    if writer_fd is None:
        pytest.skip("writer fd not discoverable on this platform")
    full = os.open("/dev/full", os.O_WRONLY)
    try:
        os.dup2(full, writer_fd)
    finally:
        os.close(full)
    with pytest.raises(RuntimeError):
        # 64x64 f64 = 32 KiB: fits stdio's buffer, so the failure is only
        # visible if flush/close actually check their returns.
        w.append_region(0, 0, 0, rng.random((cfg.ny, cfg.nx)))
        w.flush()
        w.close()
