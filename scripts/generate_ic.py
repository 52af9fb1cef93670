#!/usr/bin/env python3
"""Generate a NetCDF initial-condition file for ``ic.mode=file`` runs.

Reference analogue: scripts/generate_ic.py (the producer for the file-IC
path that the reference stubs out but this framework implements for real —
see climate_sim_tpu/ops/init.py::from_file).  Schema: dims (y, x), cell-center
coordinate variables ``x``/``y``, field variable ``u(y, x)`` float64.

Written with the self-contained classic-NetCDF codec (CDF-5), readable by
``climate_sim_tpu.io.netcdf.NetCDFFile`` and any netCDF library.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from climate_sim_tpu.io.netcdf import NetCDFWriter  # noqa: E402


def make_gaussian_ic(nx=256, ny=512, dx=1.0, dy=1.0,
                     A=1.0, sigma_frac=0.05, xc_frac=0.5, yc_frac=0.5):
    """Gaussian hotspot at cell centers (matches ops/init.py::gaussian_hotspot
    and reference init.cpp:12-33)."""
    x = (np.arange(nx) + 0.5) * dx
    y = (np.arange(ny) + 0.5) * dy
    Lx, Ly = nx * dx, ny * dy
    xc, yc = xc_frac * Lx, yc_frac * Ly
    sigma = sigma_frac * min(Lx, Ly)
    r2 = (x[None, :] - xc) ** 2 + (y[:, None] - yc) ** 2
    return A * np.exp(-r2 / (2.0 * sigma * sigma))


def write_netcdf(U, out_path, dx=1.0, dy=1.0, var="u"):
    ny, nx = U.shape
    d = os.path.dirname(out_path)
    if d:
        os.makedirs(d, exist_ok=True)
    w = NetCDFWriter(out_path, version=5)
    w.def_dim("y", ny)
    w.def_dim("x", nx)
    w.def_var("x", np.float64, ("x",))
    w.def_var("y", np.float64, ("y",))
    w.def_var(var, np.float64, ("y", "x"),
              attrs={"units": "arbitrary", "long_name": "Gaussian hotspot"})
    w.enddef()
    w.put_var("x", (np.arange(nx) + 0.5) * dx)
    w.put_var("y", (np.arange(ny) + 0.5) * dy)
    w.put_var(var, U)
    w.close()
    print(f"[netcdf] Initial condition written to {out_path} (var='{var}')")


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nx", type=int, default=16)
    p.add_argument("--ny", type=int, default=16)
    p.add_argument("--dx", type=float, default=1.0)
    p.add_argument("--dy", type=float, default=1.0)
    p.add_argument("--A", type=float, default=1.0)
    p.add_argument("--sigma-frac", type=float, default=0.05)
    p.add_argument("--xc-frac", type=float, default=0.5)
    p.add_argument("--yc-frac", type=float, default=0.5)
    p.add_argument("--var", default="u")
    p.add_argument("--out", default="inputs/ic_global.nc")
    a = p.parse_args()
    U = make_gaussian_ic(a.nx, a.ny, a.dx, a.dy, a.A, a.sigma_frac, a.xc_frac, a.yc_frac)
    write_netcdf(U, a.out, a.dx, a.dy, a.var)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
