"""Format-sniffing field access for ``ic.mode=file`` inputs.

The reference ecosystem's IC producer writes NETCDF4 (HDF5) files
(reference: scripts/generate_ic.py:23, ``Dataset(..., format="NETCDF4")``)
while this framework's own snapshots are classic CDF-5.  :func:`load_field`
reads a named 2D ``(y, x)`` field — or the LAST record of a 3D
``(time, y, x)`` variable, enabling restart-from-snapshot — from either
family:

* classic CDF-1/2/5 → the built-in codec (:class:`..netcdf.NetCDFFile`);
* HDF5 → ``netCDF4`` when installed (full fidelity), else ``h5py``
  (raw-dataset access, sufficient for the flat layouts netCDF4 writes).

So a restart file produced by the reference's own tooling — or by any
netCDF library in either format family — just works.
"""

from __future__ import annotations

import numpy as np

_HDF5_MAGIC = b"\x89HDF\r\n\x1a\n"


def sniff_format(path: str) -> str:
    """'classic' | 'hdf5' by magic bytes, or raise ValueError."""
    with open(path, "rb") as f:
        head = f.read(8)
    if head[:3] == b"CDF" and len(head) >= 4 and head[3] in (1, 2, 5):
        return "classic"
    if head == _HDF5_MAGIC:
        return "hdf5"
    raise ValueError(f"{path}: not a NetCDF file (classic or HDF5); magic {head!r}")


def _take_last_record(v, path: str, var: str) -> np.ndarray:
    """2D vars read whole; 3D vars yield their LAST record (restart)."""
    ndim = len(v.shape)
    if ndim == 2:
        return np.asarray(v[:, :])
    if ndim == 3:
        nt = v.shape[0]
        if nt == 0:
            raise ValueError(f"{path}: variable '{var}' has no records")
        return np.asarray(v[nt - 1, :, :])
    raise ValueError(f"{path}: variable '{var}' must be 2D (y,x) or 3D (time,y,x)")


def _field_ndim_check(shape, path: str, var: str) -> int:
    ndim = len(shape)
    if ndim not in (2, 3):
        raise ValueError(f"{path}: variable '{var}' must be 2D (y,x) or 3D (time,y,x)")
    if ndim == 3 and shape[0] == 0:
        raise ValueError(f"{path}: variable '{var}' has no records")
    return ndim


def probe_field(path: str, var: str = "u"):
    """``(ny, nx)`` of the 2D field — or of one record of a 3D variable —
    without reading any data (header/metadata only)."""
    kind = sniff_format(path)

    if kind == "classic":
        from .netcdf import NetCDFFile

        with NetCDFFile(path) as ds:
            if var not in ds.variables:
                raise KeyError(f"Variable '{var}' not found in {path}")
            shape = ds.variables[var].shape
            _field_ndim_check(shape, path, var)
            return tuple(shape[-2:])

    try:
        import netCDF4  # type: ignore

        with netCDF4.Dataset(path, "r") as ds:
            if var not in ds.variables:
                raise KeyError(f"Variable '{var}' not found in {path}")
            shape = ds.variables[var].shape
            _field_ndim_check(shape, path, var)
            return tuple(shape[-2:])
    except ImportError:
        pass

    with _h5py_file(path) as f:
        if var not in f:
            raise KeyError(f"Variable '{var}' not found in {path}")
        shape = f[var].shape
        _field_ndim_check(shape, path, var)
        return tuple(shape[-2:])


def load_field_region(path: str, var: str, y0: int, ny: int, x0: int, nx: int) -> np.ndarray:
    """Read ONLY rows ``[y0, y0+ny) × cols [x0, x0+nx)`` of the field (the
    last record for 3D variables), as float64.

    The shard-local restart primitive: at pod scale each process calls this
    for its own addressable shards, so no host ever materializes — or even
    transfers — the (ny, nx) global array (reference's collective hyperslab
    access pattern, io.cpp:402-424).  Classic files use the codec's
    positioned-read :meth:`NCVariable.read_region`; HDF5-family files use the
    libraries' native partial reads (chunked datasets fetch only the touched
    chunks).
    """
    kind = sniff_format(path)

    if kind == "classic":
        from .netcdf import NetCDFFile

        with NetCDFFile(path) as ds:
            if var not in ds.variables:
                raise KeyError(f"Variable '{var}' not found in {path}")
            v = ds.variables[var]
            ndim = _field_ndim_check(v.shape, path, var)
            irec = v.shape[0] - 1 if ndim == 3 else None
            data = v.read_region((y0, x0), (ny, nx), irec=irec)
        return np.asarray(data, dtype=np.float64)

    try:
        import netCDF4  # type: ignore

        with netCDF4.Dataset(path, "r") as ds:
            if var not in ds.variables:
                raise KeyError(f"Variable '{var}' not found in {path}")
            v = ds.variables[var]
            ndim = _field_ndim_check(v.shape, path, var)
            if ndim == 3:
                data = v[v.shape[0] - 1, y0 : y0 + ny, x0 : x0 + nx]
            else:
                data = v[y0 : y0 + ny, x0 : x0 + nx]
        return np.asarray(data, dtype=np.float64)
    except ImportError:
        pass

    with _h5py_file(path) as f:
        if var not in f:
            raise KeyError(f"Variable '{var}' not found in {path}")
        v = f[var]
        ndim = _field_ndim_check(v.shape, path, var)
        if ndim == 3:
            data = v[v.shape[0] - 1, y0 : y0 + ny, x0 : x0 + nx]
        else:
            data = v[y0 : y0 + ny, x0 : x0 + nx]
    return np.asarray(data, dtype=np.float64)


def _h5py_file(path: str):
    try:
        import h5py  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            f"{path} is an HDF5/NETCDF4 file but neither netCDF4 nor h5py is"
            " installed; convert it to classic NetCDF or install one of them"
        ) from e
    return h5py.File(path, "r")


def load_field(path: str, var: str = "u") -> np.ndarray:
    """Read ``var`` from ``path`` as float64, whatever the container format."""
    kind = sniff_format(path)

    if kind == "classic":
        from .netcdf import NetCDFFile

        with NetCDFFile(path) as ds:
            if var not in ds.variables:
                raise KeyError(f"Variable '{var}' not found in {path}")
            data = _take_last_record(ds.variables[var], path, var)
        return np.asarray(data, dtype=np.float64)

    # HDF5 family (NETCDF4): prefer the real netCDF4 binding when present.
    try:
        import netCDF4  # type: ignore

        with netCDF4.Dataset(path, "r") as ds:
            if var not in ds.variables:
                raise KeyError(f"Variable '{var}' not found in {path}")
            data = _take_last_record(ds.variables[var], path, var)
        return np.asarray(data, dtype=np.float64)
    except ImportError:
        pass

    try:
        import h5py  # type: ignore
    except ImportError as e:
        raise RuntimeError(
            f"{path} is an HDF5/NETCDF4 file but neither netCDF4 nor h5py is"
            " installed; convert it to classic NetCDF or install one of them"
        ) from e

    with h5py.File(path, "r") as f:
        if var not in f:
            raise KeyError(f"Variable '{var}' not found in {path}")
        data = _take_last_record(f[var], path, var)
    return np.asarray(data, dtype=np.float64)
