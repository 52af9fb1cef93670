"""NetCDF codec tests: round-trips through our reader for CDF-5 and
cross-checks against scipy's independent CDF-1/2 implementation
(reference analogue: test_io.cpp PnetCDF write/read-back sections)."""

import numpy as np
import pytest

from climate_sim_tpu.io.netcdf import NetCDFFile, NetCDFWriter


def write_sample(path, version, ny=5, nx=7, nrec=3):
    w = NetCDFWriter(path, version=version)
    w.def_dim("time", None)
    w.def_dim("y", ny)
    w.def_dim("x", nx)
    w.def_var("u", np.float64, ("time", "y", "x"))
    w.def_var("xc", np.float64, ("x",), attrs={"units": "m"})
    w.put_gatt("description", "codec test")
    w.put_gatt("answer", np.int32(42))
    w.put_gatt("pi", 3.14159)
    w.enddef()
    w.put_var("xc", np.arange(nx, dtype=np.float64) * 0.5)
    frames = []
    for t in range(nrec):
        f = np.arange(ny * nx, dtype=np.float64).reshape(ny, nx) + 100 * t
        w.put_rec("u", t, f)
        frames.append(f)
    w.close()
    return frames


@pytest.mark.parametrize("version", [1, 2, 5])
def test_roundtrip_own_reader(tmp_path, version):
    path = str(tmp_path / f"v{version}.nc")
    frames = write_sample(path, version)
    with NetCDFFile(path) as ds:
        assert ds.version == version
        assert ds.dimensions == {"time": 3, "y": 5, "x": 7}
        assert ds.getncattr("description") == "codec test"
        assert int(ds.answer) == 42
        assert float(ds.pi) == pytest.approx(3.14159)
        u = ds.variables["u"]
        assert u.shape == (3, 5, 7)
        assert u.dims == ["time", "y", "x"]
        for t, f in enumerate(frames):
            np.testing.assert_array_equal(u[t, :, :], f)
        np.testing.assert_array_equal(
            ds.variables["xc"][:], np.arange(7) * 0.5
        )
        assert ds.variables["xc"].getncattr("units") == "m"


@pytest.mark.parametrize("version", [1, 2])
def test_scipy_reads_our_files(tmp_path, version):
    """Independent implementation check: scipy's netcdf reader parses our
    CDF-1/2 output (CDF-5 is beyond scipy; covered by our reader)."""
    from scipy.io import netcdf_file

    path = str(tmp_path / f"sv{version}.nc")
    frames = write_sample(path, version)
    with netcdf_file(path, "r", mmap=False) as ds:
        assert ds.description == b"codec test"
        u = ds.variables["u"]
        assert u.shape == (3, 5, 7)
        for t, f in enumerate(frames):
            np.testing.assert_array_equal(np.asarray(u[t]), f)


def test_we_read_scipy_files(tmp_path):
    """Reverse direction: our reader parses scipy-written classic files."""
    from scipy.io import netcdf_file

    path = str(tmp_path / "scipy.nc")
    with netcdf_file(path, "w") as ds:
        ds.createDimension("time", None)
        ds.createDimension("y", 4)
        ds.createDimension("x", 3)
        v = ds.createVariable("u", "f8", ("time", "y", "x"))
        data = np.arange(24, dtype=np.float64).reshape(2, 4, 3)
        v[:] = data
        ds.history = "made by scipy"

    with NetCDFFile(path) as ours:
        assert ours.dimensions["y"] == 4 and ours.dimensions["x"] == 3
        assert ours.dimensions["time"] == 2
        np.testing.assert_array_equal(ours.variables["u"][0, :, :], data[0])
        np.testing.assert_array_equal(ours.variables["u"][1, :, :], data[1])
        assert ours.getncattr("history") == "made by scipy"


def test_numrecs_patched_incrementally(tmp_path):
    path = str(tmp_path / "inc.nc")
    w = NetCDFWriter(path, version=5)
    w.def_dim("time", None)
    w.def_dim("x", 4)
    w.def_var("u", np.float64, ("time", "x"))
    w.enddef()
    w.put_rec("u", 0, np.ones(4))
    w.sync()
    with NetCDFFile(path) as ds:
        assert ds.dimensions["time"] == 1
    w.put_rec("u", 1, 2 * np.ones(4))
    w.sync()
    with NetCDFFile(path) as ds:
        assert ds.dimensions["time"] == 2
        np.testing.assert_array_equal(ds.variables["u"][1], 2 * np.ones(4))
    w.close()


def test_multiple_record_vars_interleaved(tmp_path):
    path = str(tmp_path / "multi.nc")
    w = NetCDFWriter(path, version=2)
    w.def_dim("time", None)
    w.def_dim("x", 3)
    w.def_var("a", np.float64, ("time", "x"))
    w.def_var("b", np.float32, ("time", "x"))
    w.enddef()
    for t in range(2):
        w.put_rec("a", t, np.full(3, float(t)))
        w.put_rec("b", t, np.full(3, 10.0 + t, dtype=np.float32))
    w.close()

    from scipy.io import netcdf_file

    with netcdf_file(path, "r", mmap=False) as ds:
        np.testing.assert_array_equal(np.asarray(ds.variables["a"][1]), np.full(3, 1.0))
        np.testing.assert_array_equal(
            np.asarray(ds.variables["b"][0]), np.full(3, 10.0, dtype=np.float32)
        )
    with NetCDFFile(path) as ds:
        np.testing.assert_array_equal(ds.variables["b"][1], np.full(3, 11.0, np.float32))


def test_int_dtypes_and_char_attr(tmp_path):
    path = str(tmp_path / "ints.nc")
    w = NetCDFWriter(path, version=5)
    w.def_dim("x", 4)
    w.def_var("i32", np.int32, ("x",))
    w.def_var("i64", np.int64, ("x",))  # CDF-5-only type
    w.enddef()
    w.put_var("i32", np.array([1, -2, 3, -4], np.int32))
    w.put_var("i64", np.array([2**40, 1, -(2**41), 7], np.int64))
    w.close()
    with NetCDFFile(path) as ds:
        np.testing.assert_array_equal(ds.variables["i32"][:], [1, -2, 3, -4])
        np.testing.assert_array_equal(ds.variables["i64"][:], [2**40, 1, -(2**41), 7])


def test_bad_magic_raises(tmp_path):
    p = tmp_path / "x.nc"
    p.write_bytes(b"HDF5xxxx")
    with pytest.raises(ValueError, match="not a classic NetCDF"):
        NetCDFFile(str(p))


def test_record_index_out_of_range(tmp_path):
    path = str(tmp_path / "r.nc")
    write_sample(path, 5, nrec=2)
    with NetCDFFile(path) as ds:
        with pytest.raises(IndexError):
            ds.variables["u"][5, :, :]


def _schema_writer(path, ny, nx, create=True):
    w = NetCDFWriter(path, version=5, create=create)
    w.def_dim("time", None)
    w.def_dim("y", ny)
    w.def_dim("x", nx)
    w.def_var("u", np.float64, ("time", "y", "x"))
    w.put_gatt("description", "region test")
    w.enddef()
    return w


def test_put_rec_region_tiles_byte_identical(tmp_path):
    """A record assembled from 2x2 hyperslab tiles is byte-identical to the
    same record written whole (the parallel-write correctness contract,
    reference io.cpp:402-424)."""
    ny, nx = 6, 10
    rng = np.random.default_rng(0)
    frames = [rng.normal(size=(ny, nx)) for _ in range(2)]

    whole = str(tmp_path / "whole.nc")
    w = _schema_writer(whole, ny, nx)
    for t, f in enumerate(frames):
        w.put_rec("u", t, f)
    w.close()

    tiled = str(tmp_path / "tiled.nc")
    w = _schema_writer(tiled, ny, nx)
    for t, f in enumerate(frames):
        # deliberately out-of-order tiles, ragged split
        for y0, y1 in ((4, 6), (0, 4)):
            for x0, x1 in ((7, 10), (0, 7)):
                w.put_rec_region("u", t, (y0, x0), f[y0:y1, x0:x1])
    w.close()

    assert open(whole, "rb").read() == open(tiled, "rb").read()


def test_put_rec_region_attach_mode(tmp_path):
    """create=False attaches to an existing file, verifies the header, never
    patches numrecs; disjoint writers compose to the whole-record bytes."""
    ny, nx = 4, 8
    f = np.arange(ny * nx, dtype=np.float64).reshape(ny, nx)

    path = str(tmp_path / "shared.nc")
    creator = _schema_writer(path, ny, nx)
    creator.put_rec_region("u", 0, (0, 0), f[:2])  # top band + numrecs patch

    other = _schema_writer(path, ny, nx, create=False)
    other.put_rec_region("u", 0, (2, 0), f[2:])  # bottom band, no header touch
    other.close()
    creator.close()

    with NetCDFFile(path) as ds:
        assert ds.dimensions["time"] == 1
        np.testing.assert_array_equal(ds.variables["u"][0, :, :], f)

    ref = str(tmp_path / "ref.nc")
    w = _schema_writer(ref, ny, nx)
    w.put_rec("u", 0, f)
    w.close()
    assert open(path, "rb").read() == open(ref, "rb").read()


def test_attach_mode_header_mismatch_raises(tmp_path):
    path = str(tmp_path / "a.nc")
    _schema_writer(path, 4, 8).close()
    with pytest.raises(ValueError, match="header does not match"):
        _schema_writer(path, 4, 9, create=False)


def test_put_rec_region_bounds_checked(tmp_path):
    path = str(tmp_path / "b.nc")
    w = _schema_writer(path, 4, 8)
    with pytest.raises(ValueError, match="exceeds"):
        w.put_rec_region("u", 0, (3, 0), np.zeros((2, 8)))
    with pytest.raises(ValueError, match="rank"):
        w.put_rec_region("u", 0, (0,), np.zeros((4, 8)))
    w.close()


# ------------------------------------------------- region reads (restart)


@pytest.mark.parametrize("version", [2, 5])
def test_read_region_matches_full_read(tmp_path, version):
    """read_region == the same slice of a full-record read, for record and
    non-record variables, interior and edge-touching regions."""
    path = str(tmp_path / "r.nc")
    frames = write_sample(path, version, ny=6, nx=9, nrec=2)
    with NetCDFFile(path) as ds:
        u = ds.variables["u"]
        for (y0, ny), (x0, nx) in [
            ((0, 6), (0, 9)),   # whole field (single coalesced read)
            ((2, 3), (0, 9)),   # full rows (coalesced)
            ((1, 4), (3, 5)),   # interior block (per-row reads)
            ((5, 1), (8, 1)),   # single corner cell
            ((0, 0), (0, 0)),   # empty region
        ]:
            for irec in (0, 1, -1):
                got = u.read_region((y0, x0), (ny, nx), irec=irec)
                np.testing.assert_array_equal(
                    got, frames[irec][y0 : y0 + ny, x0 : x0 + nx]
                )
        xc = ds.variables["xc"]
        np.testing.assert_array_equal(
            xc.read_region((2,), (4,)), (np.arange(9) * 0.5)[2:6]
        )


def test_read_region_errors(tmp_path):
    path = str(tmp_path / "e.nc")
    write_sample(path, 5, ny=6, nx=9, nrec=2)
    with NetCDFFile(path) as ds:
        u = ds.variables["u"]
        with pytest.raises(ValueError, match="requires irec"):
            u.read_region((0, 0), (2, 2))
        with pytest.raises(IndexError, match="out of range"):
            u.read_region((0, 0), (2, 2), irec=5)
        with pytest.raises(IndexError, match="outside dimension"):
            u.read_region((5, 0), (2, 9), irec=0)
        with pytest.raises(ValueError, match="rank"):
            u.read_region((0,), (2,), irec=0)


def test_read_region_scalar_record_variable(tmp_path):
    """Rank-0 regions (one record of a scalar record variable, e.g. a
    restart timestamp) read back as 0-d arrays instead of crashing."""
    from climate_sim_tpu.io.netcdf import NetCDFFile, NetCDFWriter

    p = str(tmp_path / "scalar_rec.nc")
    with NetCDFWriter(p) as w:
        w.def_dim("time", None)
        w.def_var("t", np.float64, ("time",))
        w.enddef()
        for i in range(3):
            w.put_rec("t", i, np.float64(10.0 * i))
    with NetCDFFile(p) as ds:
        v = ds.variables["t"]
        for i in (0, 2, -1):
            out = v.read_region((), (), irec=i)
            assert out.shape == ()
            assert float(out) == 10.0 * (i % 3)


def test_attach_writer_never_patches_numrecs(tmp_path):
    """An attached (create=False) writer re-writing an old record must not
    shrink the creator's numrecs (regression: put_rec patched the header
    unconditionally)."""
    from climate_sim_tpu.io.netcdf import NetCDFFile, NetCDFWriter

    p = str(tmp_path / "attach.nc")
    w = NetCDFWriter(p)
    w.def_dim("time", None)
    w.def_dim("y", 2)
    w.def_dim("x", 3)
    w.def_var("u", np.float64, ("time", "y", "x"))
    w.enddef()
    for i in range(5):
        w.put_rec("u", i, np.full((2, 3), float(i)))
    w.sync()

    a = NetCDFWriter(p, create=False)
    a.def_dim("time", None)
    a.def_dim("y", 2)
    a.def_dim("x", 3)
    a.def_var("u", np.float64, ("time", "y", "x"))
    a.enddef()
    a.put_rec("u", 1, np.full((2, 3), 99.0))
    a.close()
    w.close()

    with NetCDFFile(p) as ds:
        assert ds.numrecs == 5
        assert ds.variables["u"].shape == (5, 2, 3)
        assert float(ds.variables["u"][1].max()) == 99.0
        assert float(ds.variables["u"][4].max()) == 4.0


def test_cdf1_rejects_wide_types_and_coerces_int_attrs(tmp_path):
    """CDF-1/2 files only know the six classic types: int64 attribute
    values are narrowed to NC_INT when they fit (and rejected when not);
    int64 variables are rejected outright (regression: NC_INT64 was
    silently emitted into CDF-1 headers, producing files other readers
    reject)."""
    import scipy.io

    from climate_sim_tpu.io.netcdf import NetCDFWriter

    p = str(tmp_path / "v1.nc")
    with NetCDFWriter(p, version=1) as w:
        w.def_dim("x", 4)
        w.def_var("u", np.float64, ("x",))
        w.put_gatt("count", 7)           # python int -> int64 -> NC_INT
        w.put_gatt("big", np.int32(12))
        w.enddef()
        w.put_var("u", np.arange(4.0))
    with scipy.io.netcdf_file(p, "r") as ds:  # independent reader
        assert int(ds.count) == 7

    with NetCDFWriter(str(tmp_path / "v1b.nc"), version=1) as w:
        w.def_dim("x", 4)
        with pytest.raises(TypeError, match="CDF-5"):
            w.def_var("n", np.int64, ("x",))

    w = NetCDFWriter(str(tmp_path / "v1c.nc"), version=1)
    w.def_dim("x", 4)
    w.def_var("u", np.float64, ("x",))
    w.put_gatt("huge", 2**40)            # does not fit NC_INT
    with pytest.raises(TypeError, match="NC_INT range"):
        w.enddef()


def test_record_slice_reads(tmp_path):
    from climate_sim_tpu.io.netcdf import NetCDFFile, NetCDFWriter

    p = str(tmp_path / "slices.nc")
    with NetCDFWriter(p) as w:
        w.def_dim("time", None)
        w.def_dim("y", 2)
        w.def_dim("x", 2)
        w.def_var("u", np.float64, ("time", "y", "x"))
        w.enddef()
        for i in range(6):
            w.put_rec("u", i, np.full((2, 2), float(i)))
    with NetCDFFile(p) as ds:
        v = ds.variables["u"]
        np.testing.assert_array_equal(v[1:3].max(axis=(1, 2)), [1.0, 2.0])
        np.testing.assert_array_equal(v[::2, 0, 0], [0.0, 2.0, 4.0])
        assert v[4:2].shape == (0, 2, 2)
