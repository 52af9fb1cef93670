"""Independent NumPy float64 oracle mirroring the reference's per-step
semantics literally (halo-padded tile, in-place ghost rewrites, unsplit Euler
update) — the stand-in for the C++ binary in parity tests (SURVEY.md §4.4).

Step order (reference: src/main.cpp:101-109): halo/BC ghost refresh ->
copy -> diffusion (writes tmp from u) -> advection (accumulates into tmp,
reading old u) -> swap.

``periodic_mode``:
* "wrap"   — true periodic wrap (our framework's default behavior),
* "compat" — the reference's actual behavior: no Periodic branch, ghosts
  keep their initial 0.0 forever (numerically Dirichlet 0).
"""

from __future__ import annotations

import numpy as np


def apply_bc_oracle(up, bc, value=0.0, periodic_mode="wrap"):
    """Rewrite the ghost ring of padded array ``up`` in place.

    Column passes first, then row passes over the full padded width —
    the reference's ordering (boundary.cpp:24-53)."""
    left, right, bottom, top = bc

    def side(kind, ghost_slice, mirror_slice, wrap_slice):
        if kind == "dirichlet":
            up[ghost_slice] = value
        elif kind == "neumann":
            up[ghost_slice] = up[mirror_slice]
        elif kind == "periodic":
            if periodic_mode == "wrap":
                up[ghost_slice] = up[wrap_slice]
            # compat: leave untouched (stays at initial fill)
        else:
            raise ValueError(kind)

    # x sides (columns), full padded height
    side(left, np.s_[:, 0], np.s_[:, 1], np.s_[:, -2])
    side(right, np.s_[:, -1], np.s_[:, -2], np.s_[:, 1])
    # y sides (rows), full padded width
    side(bottom, np.s_[0, :], np.s_[1, :], np.s_[-2, :])
    side(top, np.s_[-1, :], np.s_[-2, :], np.s_[1, :])


def oracle_step(up, D, vx, vy, dt, dx, dy):
    """One unsplit Euler update; returns the new padded array (ghosts carried
    over unchanged, like diffusion.cpp:18-25's ring copy)."""
    tmp = up.copy()
    c = up[1:-1, 1:-1]
    xm = up[1:-1, :-2]
    xp = up[1:-1, 2:]
    ym = up[:-2, 1:-1]
    yp = up[2:, 1:-1]

    lap = (xp - 2.0 * c + xm) / (dx * dx) + (yp - 2.0 * c + ym) / (dy * dy)
    tmp[1:-1, 1:-1] = c + dt * D * lap

    dudx = (c - xm) / dx if vx >= 0.0 else (xp - c) / dx
    dudy = (c - ym) / dy if vy >= 0.0 else (yp - c) / dy
    tmp[1:-1, 1:-1] += (-dt) * (vx * dudx + vy * dudy)
    return tmp


def run_oracle(u0, steps, D, vx, vy, dt, dx=1.0, dy=1.0,
               bc=("dirichlet",) * 4, value=0.0, periodic_mode="wrap"):
    """Advance interior field u0 (ny, nx) by ``steps``; returns the final
    interior.  Ghosts start at 0.0 (Field::fill, main.cpp:68-69)."""
    ny, nx = u0.shape
    up = np.zeros((ny + 2, nx + 2), dtype=np.float64)
    up[1:-1, 1:-1] = np.asarray(u0, dtype=np.float64)
    for _ in range(steps):
        apply_bc_oracle(up, bc, value, periodic_mode)
        up = oracle_step(up, D, vx, vy, dt, dx, dy)
    return up[1:-1, 1:-1].copy()


def gaussian_ic(nx, ny, dx=1.0, dy=1.0, A=1.0, sigma_frac=0.05, xc_frac=0.5, yc_frac=0.5):
    """Cell-centered Gaussian identical to the reference (init.cpp:12-33)."""
    Lx, Ly = nx * dx, ny * dy
    xc, yc = xc_frac * Lx, yc_frac * Ly
    sig = sigma_frac * min(Lx, Ly)
    x = (np.arange(nx) + 0.5) * dx
    y = (np.arange(ny) + 0.5) * dy
    r2 = (x[None, :] - xc) ** 2 + (y[:, None] - yc) ** 2
    return A * np.exp(-r2 / (2.0 * sig * sig))
