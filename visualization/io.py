"""Snapshot-file data access (reference API: visualization/io.py:13-56).

Contracts preserved exactly:

* directory must exist -> FileNotFoundError("directory not found: ...")
* no .nc file in it -> FileNotFoundError (load_global/load_metadata) or
  empty list (list_available_steps)
* missing variable -> KeyError
* missing 'time' dimension -> RuntimeError
* step out of range -> IndexError

Backend: netCDF4 when importable (so the package also runs in environments
that already use it), else the built-in classic-NetCDF reader — both read the
same ``u(time, y, x)`` files.
"""

from __future__ import annotations

import os
from typing import Dict, List

import numpy as np


def _first_nc_path(base_outputs_dir: str) -> str:
    """Return the alphabetically first .nc file in the directory, or '' if
    none (sorted so multi-file directories resolve deterministically across
    filesystems — os.listdir order is arbitrary)."""
    if not os.path.isdir(base_outputs_dir):
        raise FileNotFoundError(f"directory not found: {base_outputs_dir}")
    for name in sorted(os.listdir(base_outputs_dir)):
        if name.endswith(".nc"):
            return os.path.join(base_outputs_dir, name)
    return ""


def _open_dataset(nc_path: str):
    """Open with netCDF4 if available, else the built-in reader.

    Both expose .dimensions / .variables / .ncattrs() compatibly.
    """
    try:
        import netCDF4  # type: ignore

        return netCDF4.Dataset(nc_path, "r")
    except ImportError:
        from climate_sim_tpu.io.netcdf import NetCDFFile

        return NetCDFFile(nc_path)


def _time_steps(ds, nc_path: str) -> int:
    if "time" not in ds.dimensions:
        raise RuntimeError(f"No time dimension 'time' in {nc_path}")
    dim = ds.dimensions["time"]
    # netCDF4 gives a Dimension object; the built-in reader gives an int.
    return len(dim) if hasattr(dim, "__len__") else int(dim)


def list_available_steps(base_outputs_dir: str) -> List[int]:
    """All snapshot indices in the directory's (first) .nc file."""
    nc_path = _first_nc_path(base_outputs_dir)
    if not nc_path:
        return []
    ds = _open_dataset(nc_path)
    try:
        return list(range(_time_steps(ds, nc_path)))
    finally:
        ds.close()


def load_global(base_outputs_dir: str, step: int, var: str = "u") -> np.ndarray:
    """Load one global (y, x) snapshot as float ndarray."""
    nc_path = _first_nc_path(base_outputs_dir)
    if not nc_path:
        raise FileNotFoundError(f"No NetCDF file found in {base_outputs_dir}")
    ds = _open_dataset(nc_path)
    try:
        if var not in ds.variables:
            raise KeyError(f"Variable '{var}' not found in {nc_path}")
        nt = _time_steps(ds, nc_path)
        if step < 0 or step >= nt:
            raise IndexError(f"Step {step} out of range [0, {nt - 1}]")
        data = ds.variables[var][step, :, :]
    finally:
        ds.close()
    return np.asarray(data, dtype=float)


def load_metadata(base_outputs_dir: str) -> Dict[str, str]:
    """All global attributes of the snapshot file as a dict."""
    nc_path = _first_nc_path(base_outputs_dir)
    if not nc_path:
        raise FileNotFoundError(f"No NetCDF file found in {base_outputs_dir}")
    ds = _open_dataset(nc_path)
    try:
        return {name: getattr(ds, name) for name in ds.ncattrs()}
    finally:
        ds.close()


class SnapshotReader:
    """One open snapshot file serving many frame reads.

    ``load_global`` opens, header-parses and closes the file per call —
    fine for one-shot reads, wasteful for a consumer touching hundreds of
    frames (the animation exporter).  Same error contracts as the
    one-shot functions: FileNotFoundError / KeyError / RuntimeError /
    IndexError.
    """

    def __init__(self, base_outputs_dir: str, var: str = "u"):
        nc_path = _first_nc_path(base_outputs_dir)
        if not nc_path:
            raise FileNotFoundError(f"No NetCDF file found in {base_outputs_dir}")
        self._ds = _open_dataset(nc_path)
        try:
            if var not in self._ds.variables:
                raise KeyError(f"Variable '{var}' not found in {nc_path}")
            self.num_steps = _time_steps(self._ds, nc_path)
        except Exception:
            self._ds.close()
            raise
        self._var = self._ds.variables[var]
        self._closed = False

    def frame(self, step: int) -> np.ndarray:
        if step < 0 or step >= self.num_steps:
            raise IndexError(f"Step {step} out of range [0, {self.num_steps - 1}]")
        return np.asarray(self._var[step, :, :], dtype=float)

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._ds.close()

    def __enter__(self) -> "SnapshotReader":
        return self

    def __exit__(self, *exc) -> None:
        self.close()
