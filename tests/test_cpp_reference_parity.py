"""Differential parity against the COMPILED C++ reference numerics.

Round 1 noted "the C++ reference binary is not buildable in this image"
(no MPI/PnetCDF) and used a NumPy oracle as a stand-in.  This module does
better: the reference's numerics sources — field.cpp, boundary.cpp,
diffusion.cpp, advection.cpp (plus the header-only stability.hpp) — touch
MPI only through Decomp2D's *data members*, so they compile unmodified,
in place from /root/reference, against a 3-line MPI *type* shim
(tests/cpp_oracle/mpi.h).  tests/cpp_oracle/ref_harness.cc replicates the
reference main loop's observable step order exactly (main.cpp:93-118) on
a single rank, where every side is a physical edge — the same fake-
Decomp2D pattern the reference's own unit tests use (test_init.cpp:35-45).

This closes the BASELINE.md correctness target ("allclose vs climate_sim
after 1000 steps") against the reference's OWN compiled code: measured
max |diff| ~1e-15 over 1000 f64 steps.  No reference code is copied into
this repository — the sources are compiled read-only via -I/-c paths;
the tests skip cleanly where /root/reference or a C++ toolchain is absent.
"""

import os
import shutil
import subprocess

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climate_sim_tpu.config import BCConfig, BCType, SimConfig
from climate_sim_tpu.ops.stability import safe_dt
from climate_sim_tpu.ops.step import build_single_device_advance
from oracle import gaussian_ic

REFERENCE = "/root/reference"
SHIM_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "cpp_oracle")
REF_SOURCES = ["field.cpp", "boundary.cpp", "diffusion.cpp", "advection.cpp"]

BC = {"d": BCType.DIRICHLET, "n": BCType.NEUMANN, "p": BCType.PERIODIC}


@pytest.fixture(scope="module")
def ref_harness(tmp_path_factory):
    if not os.path.isdir(os.path.join(REFERENCE, "src")):
        pytest.skip("reference sources not available")
    gxx = shutil.which("g++") or shutil.which("c++")
    if gxx is None:
        pytest.skip("no C++ compiler")
    out = str(tmp_path_factory.mktemp("refbuild") / "ref_harness")
    cmd = [
        gxx, "-std=c++17", "-O2",
        "-I", SHIM_DIR, "-I", os.path.join(REFERENCE, "include"),
        os.path.join(SHIM_DIR, "ref_harness.cc"),
        *[os.path.join(REFERENCE, "src", s) for s in REF_SOURCES],
        "-o", out,
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    # With the reference tree AND a compiler both present, a compile error
    # must FAIL (not skip): otherwise a broken shim/harness would silently
    # disable the whole BASELINE-closing gate while the suite stays green.
    assert proc.returncode == 0, (
        f"reference numerics did not compile:\n{proc.stderr[-1500:]}"
    )
    return out


def run_reference(harness, u0, cfg, steps, tmp_path, bcs):
    """``bcs`` is the same 'd'/'n'/'p' letter string the cfg was built
    from (no enum->letter reverse mapping to drift)."""
    ib = str(tmp_path / "in.bin")
    ob = str(tmp_path / "out.bin")
    np.asarray(u0, np.float64).tofile(ib)
    subprocess.run(
        [harness, "step", str(cfg.nx), str(cfg.ny), repr(cfg.dx), repr(cfg.dy),
         repr(cfg.D), repr(cfg.vx), repr(cfg.vy), repr(cfg.dt), str(steps),
         bcs[0], bcs[1], bcs[2], bcs[3], ib, ob],
        check=True, timeout=300,
    )
    return np.fromfile(ob, np.float64).reshape(cfg.ny, cfg.nx)


def make_cfg(nx, ny, D, vx, vy, dt, bcs, dx=1.0, dy=1.0):
    cfg = SimConfig(nx=nx, ny=ny, dx=dx, dy=dy, D=D, vx=vx, vy=vy, dt=dt,
                    steps=1, out_every=1)
    cfg.precision = "f64"
    cfg.kernel = "jnp"
    # The reference's periodic is a silent no-op (ghosts stay at their
    # initial fill(0.0)); strict_reference_compat reproduces that exactly.
    cfg.strict_reference_compat = "p" in bcs
    cfg.bc = BCConfig(*[BC[c] for c in bcs])
    return cfg


CASES = [
    # (bcs, D, vx, vy, dt, steps, dx, dy)
    ("dddd", 0.05, 0.5, -0.25, 0.1, 200, 1.0, 1.0),
    ("nnnn", 0.2, 0.0, 0.0, 0.5, 200, 1.0, 1.0),
    ("pppp", 0.1, 0.4, -0.2, 0.4, 200, 1.0, 1.0),
    ("dnpd", 0.05, 0.5, 0.0, 0.1, 100, 1.0, 1.0),   # the dev.yaml mix
    ("ndpn", 0.1, -0.7, 0.3, 0.05, 100, 0.5, 2.0),  # anisotropic, both upwinds
]


@pytest.mark.parametrize("bcs,D,vx,vy,dt,steps,dx,dy", CASES)
def test_step_parity_vs_compiled_reference(
    ref_harness, tmp_path, bcs, D, vx, vy, dt, steps, dx, dy
):
    nx, ny = 128, 96
    cfg = make_cfg(nx, ny, D, vx, vy, dt, bcs, dx, dy)
    u0 = gaussian_ic(nx, ny, dx, dy)
    ref = run_reference(ref_harness, u0, cfg, steps, tmp_path, bcs)
    adv = build_single_device_advance(cfg, dt)
    ours = np.asarray(jax.device_get(adv(steps)(jnp.asarray(u0, jnp.float64))))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.mark.slow
def test_long_horizon_1000_steps_vs_compiled_reference(ref_harness, tmp_path):
    """The BASELINE.md correctness gate, against the reference's own
    compiled numerics: 1000 f64 steps of the dev.yaml BC mix (grid scaled
    to keep the bounds-checked reference loops CI-fast; the numerics are
    grid-size-independent and the 1024^2 case covers large-extent
    indexing)."""
    cfg = make_cfg(128, 96, 0.05, 0.5, -0.25, 0.1, "dnpd")
    u0 = gaussian_ic(128, 96)
    ref = run_reference(ref_harness, u0, cfg, 1000, tmp_path, "dnpd")
    adv = build_single_device_advance(cfg, cfg.dt)
    ours = np.asarray(jax.device_get(adv(1000)(jnp.asarray(u0, jnp.float64))))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.mark.slow
def test_large_grid_parity_vs_compiled_reference(ref_harness, tmp_path):
    """1024^2, 20 steps: large-extent indexing on both sides (the
    reference's size_t idx math vs our array ops)."""
    cfg = make_cfg(1024, 1024, 0.05, 0.5, -0.25, 0.1, "dnpd")
    u0 = gaussian_ic(1024, 1024)
    ref = run_reference(ref_harness, u0, cfg, 20, tmp_path, "dnpd")
    adv = build_single_device_advance(cfg, cfg.dt)
    ours = np.asarray(jax.device_get(adv(20)(jnp.asarray(u0, jnp.float64))))
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_seeded_differential_fuzz_vs_compiled_reference(ref_harness, tmp_path):
    """Seeded randomized differential net against the compiled reference
    (params, grids, BC mixes, edge-parked hotspots).  A 200-trial ad-hoc
    campaign with the same generator found zero failures; this keeps 5
    fast trials as the standing regression net."""
    import random

    rng = random.Random(20260818)
    for trial in range(5):
        nx = rng.choice([32, 48, 64, 96])
        ny = rng.choice([24, 40, 64])
        dx = rng.choice([0.5, 1.0, 2.0])
        dy = rng.choice([0.5, 1.0, 2.0])
        D = rng.choice([0.0, 0.05, 0.24])
        vx = rng.choice([0.0, 0.5, -0.7])
        vy = rng.choice([0.0, 0.3, -0.5])
        denom = abs(vx) / dx + abs(vy) / dy + 2 * D * (1 / dx**2 + 1 / dy**2)
        dt = 0.9 / denom if denom > 0 else 0.1
        steps = rng.choice([1, 7, 50])
        bcs = "".join(rng.choice("dnp") for _ in range(4))
        cfg = make_cfg(nx, ny, D, vx, vy, dt, bcs, dx, dy)
        u0 = gaussian_ic(nx, ny, dx, dy, xc_frac=rng.choice([0.5, 0.9, 0.1]))
        ref = run_reference(ref_harness, u0, cfg, steps, tmp_path, bcs)
        adv = build_single_device_advance(cfg, dt)
        ours = np.asarray(
            jax.device_get(adv(steps)(jnp.asarray(u0, jnp.float64)))
        )
        np.testing.assert_allclose(
            ours, ref, rtol=0, atol=1e-11,
            err_msg=f"trial {trial}: {(nx, ny, dx, dy, D, vx, vy, dt, steps, bcs)}",
        )


def test_safe_dt_parity_vs_reference_header(ref_harness):
    """ops/stability.safe_dt vs the reference's header-only safe_dt
    (stability.hpp:5-16), bit-for-bit over representative regimes."""
    for dx, dy, vx, vy, D in [
        (1.0, 1.0, 0.5, -0.25, 0.05),
        (0.5, 2.0, 0.0, 0.0, 0.3),     # diffusion-only
        (1.0, 1.0, 1.5, 0.5, 0.0),     # advection-only
        (0.25, 0.25, -2.0, 3.0, 1.0),
    ]:
        got = subprocess.run(
            [ref_harness, "safe_dt", repr(dx), repr(dy), repr(vx), repr(vy),
             repr(D)],
            check=True, capture_output=True, text=True,
        ).stdout.strip()
        assert float(got) == safe_dt(dx, dy, vx, vy, D), (dx, dy, vx, vy, D)
