"""Ghost-ring / BC tests (reference analogue: test_boundary.cpp, single-rank
case where all four sides are physical)."""

import numpy as np
import jax.numpy as jnp

from climate_sim_tpu.config import BCConfig, BCType
from climate_sim_tpu.ops import pad_with_ghosts


def field(ny=4, nx=6):
    return jnp.arange(ny * nx, dtype=jnp.float64).reshape(ny, nx) + 1.0


def test_dirichlet_ring_value():
    u = field()
    up = np.asarray(pad_with_ghosts(u, BCConfig(), value=7.5))
    assert np.all(up[:, 0][1:-1] == 7.5)
    assert np.all(up[:, -1][1:-1] == 7.5)
    assert np.all(up[0, :] == 7.5)
    assert np.all(up[-1, :] == 7.5)
    np.testing.assert_array_equal(up[1:-1, 1:-1], np.asarray(u))


def test_neumann_mirrors_interior():
    u = field()
    bc = BCConfig(
        left=BCType.NEUMANN, right=BCType.NEUMANN,
        bottom=BCType.NEUMANN, top=BCType.NEUMANN,
    )
    up = np.asarray(pad_with_ghosts(u, bc, 0.0))
    un = np.asarray(u)
    np.testing.assert_array_equal(up[1:-1, 0], un[:, 0])
    np.testing.assert_array_equal(up[1:-1, -1], un[:, -1])
    np.testing.assert_array_equal(up[0, 1:-1], un[0, :])
    np.testing.assert_array_equal(up[-1, 1:-1], un[-1, :])


def test_periodic_wraps():
    u = field()
    bc = BCConfig(
        left=BCType.PERIODIC, right=BCType.PERIODIC,
        bottom=BCType.PERIODIC, top=BCType.PERIODIC,
    )
    up = np.asarray(pad_with_ghosts(u, bc, 0.0))
    un = np.asarray(u)
    np.testing.assert_array_equal(up[1:-1, 0], un[:, -1])
    np.testing.assert_array_equal(up[1:-1, -1], un[:, 0])
    np.testing.assert_array_equal(up[0, 1:-1], un[-1, :])
    np.testing.assert_array_equal(up[-1, 1:-1], un[0, :])


def test_periodic_compat_is_zero():
    """strict_reference_compat: the reference's Periodic has no branch so the
    ghost ring stays at its fill(0.0) (boundary.cpp:23-53)."""
    u = field()
    bc = BCConfig(
        left=BCType.PERIODIC, right=BCType.PERIODIC,
        bottom=BCType.PERIODIC, top=BCType.PERIODIC,
    )
    up = np.asarray(pad_with_ghosts(u, bc, 0.0, compat=True))
    assert np.all(up[1:-1, 0] == 0.0)
    assert np.all(up[1:-1, -1] == 0.0)
    assert np.all(up[0, 1:-1] == 0.0)
    assert np.all(up[-1, 1:-1] == 0.0)


def test_mixed_sides_like_dev_yaml():
    u = field()
    bc = BCConfig(
        left=BCType.DIRICHLET, right=BCType.NEUMANN,
        bottom=BCType.PERIODIC, top=BCType.DIRICHLET,
    )
    up = np.asarray(pad_with_ghosts(u, bc, 0.0))
    un = np.asarray(u)
    assert np.all(up[1:-1, 0] == 0.0)                      # left dirichlet
    np.testing.assert_array_equal(up[1:-1, -1], un[:, -1])  # right neumann
    np.testing.assert_array_equal(up[0, 1:-1], un[-1, :])   # bottom wraps
    assert np.all(up[-1, 1:-1] == 0.0)                      # top dirichlet
