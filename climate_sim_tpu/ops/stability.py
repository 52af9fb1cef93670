"""CFL / stability guard (reference: include/stability.hpp:5-16).

``safe_dt = min( 1/(|vx|/dx + |vy|/dy),  1/(2 D (1/dx^2 + 1/dy^2)) )`` with each
term infinite when its physics is inactive.  Matches the envelope documented in
the reference (docs/numerics.md: Cx+Cy <= 1 and mu_x+mu_y <= 1/2).
"""

from __future__ import annotations

import math


def safe_dt(dx: float, dy: float, vx: float, vy: float, D: float) -> float:
    denom_adv = abs(vx) / dx + abs(vy) / dy
    dt_adv = 1.0 / denom_adv if denom_adv > 0 else math.inf

    denom_diff = 1.0 / (dx * dx) + 1.0 / (dy * dy)
    dt_diff = 1.0 / (2.0 * D * denom_diff) if D > 0 else math.inf

    return min(dt_adv, dt_diff)


def clamp_dt(dt: float, dx: float, dy: float, vx: float, vy: float, D: float):
    """Return (possibly clamped dt, limit, clamped?) — the reference clamps with
    a rank-0 warning when dt exceeds the limit (main.cpp:42-49)."""
    limit = safe_dt(dx, dy, vx, vy, D)
    if dt > limit:
        return limit, limit, True
    return dt, limit, False
