"""Numerics-exactness tests (reference analogues: test_diffusion.cpp,
test_advection.cpp, test_stability.cpp) in float64."""

import math

import numpy as np
import jax.numpy as jnp
import pytest

from climate_sim_tpu.config import BCConfig, BCType
from climate_sim_tpu.ops import (
    advection_step,
    diffusion_step,
    fused_step,
    pad_with_ghosts,
    safe_dt,
)


def impulse(ny=9, nx=9, dtype=jnp.float64):
    u = jnp.zeros((ny, nx), dtype=dtype)
    return u.at[ny // 2, nx // 2].set(1.0)


def test_diffusion_impulse_exact():
    """Single impulse, one step: center 1-4a, the four neighbors a, a=D*dt/dx^2
    (reference: test_diffusion.cpp:17-34), exact to 1e-12."""
    D, dt, dx, dy = 1.0, 0.2, 1.0, 1.0
    a = D * dt / (dx * dx)
    assert a <= 0.25
    u = impulse()
    up = pad_with_ghosts(u, BCConfig(), 0.0)
    out = np.asarray(diffusion_step(up, D, dt, dx, dy))
    c = 4  # center index
    assert out[c, c] == pytest.approx(1.0 - 4.0 * a, abs=1e-12)
    for dj, di in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        assert out[c + dj, c + di] == pytest.approx(a, abs=1e-12)
    # everything else untouched
    mask = np.zeros_like(out, dtype=bool)
    mask[c, c] = True
    for dj, di in ((0, 1), (0, -1), (1, 0), (-1, 0)):
        mask[c + dj, c + di] = True
    assert np.all(out[~mask] == 0.0)


def test_diffusion_anisotropic_spacing():
    D, dt, dx, dy = 0.5, 0.1, 0.5, 2.0
    ax = D * dt / (dx * dx)
    ay = D * dt / (dy * dy)
    u = impulse()
    up = pad_with_ghosts(u, BCConfig(), 0.0)
    out = np.asarray(diffusion_step(up, D, dt, dx, dy))
    c = 4
    assert out[c, c] == pytest.approx(1.0 - 2 * ax - 2 * ay, abs=1e-12)
    assert out[c, c + 1] == pytest.approx(ax, abs=1e-12)
    assert out[c + 1, c] == pytest.approx(ay, abs=1e-12)


def test_advection_zero_velocity_noop():
    u = impulse()
    up = pad_with_ghosts(u, BCConfig(), 0.0)
    out = np.asarray(advection_step(up, u, 0.0, 0.0, 0.3, 1.0, 1.0))
    np.testing.assert_array_equal(out, np.asarray(u))


@pytest.mark.parametrize(
    "vx,vy,downwind",
    [
        (1.0, 0.0, (0, 1)),   # +x: mass moves right
        (-1.0, 0.0, (0, -1)),
        (0.0, 1.0, (1, 0)),   # +y: mass moves up
        (0.0, -1.0, (-1, 0)),
    ],
)
def test_advection_upwind_signs(vx, vy, downwind):
    """Each velocity sign perturbs the hotspot cell and feeds the downwind
    neighbor (reference: test_advection.cpp:13-71)."""
    dt = 0.4
    u = impulse()
    up = pad_with_ghosts(u, BCConfig(), 0.0)
    out = np.asarray(advection_step(up, u, vx, vy, dt, 1.0, 1.0))
    c = 4
    # hotspot loses mass
    assert out[c, c] == pytest.approx(1.0 - dt, abs=1e-12)
    # downwind neighbor gains
    dj, di = downwind
    assert out[c + dj, c + di] == pytest.approx(dt, abs=1e-12)


def test_fused_equals_composition():
    """fused_step == diffusion_step then accumulating advection_step
    (the reference's two-kernel sequence, main.cpp:106-107)."""
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal((16, 24)))
    bc = BCConfig(left=BCType.NEUMANN, top=BCType.PERIODIC)
    up = pad_with_ghosts(u, bc, 0.0)
    D, vx, vy, dt, dx, dy = 0.05, 0.5, -0.3, 0.1, 1.0, 2.0
    d = diffusion_step(up, D, dt, dx, dy)
    comp = advection_step(up, d, vx, vy, dt, dx, dy)
    fus = fused_step(up, D, vx, vy, dt, dx, dy)
    np.testing.assert_allclose(np.asarray(fus), np.asarray(comp), rtol=0, atol=1e-14)


def test_safe_dt_properties():
    """Positive; decreases with higher v and higher D
    (reference: test_stability.cpp:5-27)."""
    assert safe_dt(1.0, 1.0, 0.0, 0.0, 0.0) == math.inf
    base = safe_dt(1.0, 1.0, 1.0, 0.0, 0.1)
    assert base > 0
    assert safe_dt(1.0, 1.0, 2.0, 0.0, 0.1) < base
    assert safe_dt(1.0, 1.0, 1.0, 0.0, 0.5) < base
    # exact closed forms
    assert safe_dt(1.0, 1.0, 2.0, 0.0, 0.0) == pytest.approx(0.5)
    assert safe_dt(1.0, 1.0, 1.0, 1.0, 0.0) == pytest.approx(0.5)
    assert safe_dt(1.0, 1.0, 0.0, 0.0, 1.0) == pytest.approx(0.25)
    assert safe_dt(0.5, 2.0, 0.0, 0.0, 1.0) == pytest.approx(1.0 / (2.0 * (1 / 0.25 + 1 / 4.0)))


def test_combined_dt_limit():
    """The combined advection+diffusion positivity bound: tighter than
    safe_dt whenever BOTH physics are active, equal when only one is
    (reference gap documented in docs/numerics.md §Stability)."""
    from climate_sim_tpu.ops import combined_dt_limit

    assert combined_dt_limit(1.0, 1.0, 0.0, 0.0, 0.0) == math.inf
    # single-physics: matches safe_dt's active envelope
    assert combined_dt_limit(1.0, 1.0, 2.0, 0.0, 0.0) == pytest.approx(0.5)
    assert combined_dt_limit(1.0, 1.0, 0.0, 0.0, 1.0) == pytest.approx(0.25)
    # both active: strictly tighter than either envelope alone
    c = combined_dt_limit(1.0, 1.0, 0.0, 0.9, 0.15)
    assert c == pytest.approx(1.0 / (0.9 + 0.6))
    assert c < safe_dt(1.0, 1.0, 0.0, 0.9, 0.15)
    # the documented divergent example sits in the gap
    assert c < 1.0 < safe_dt(1.0, 1.0, 0.0, 0.9, 0.15) * 1.12
