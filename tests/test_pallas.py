"""Pallas kernel parity tests (interpret mode on CPU).

The Pallas multi-step kernel must agree with the jnp oracle
(pad_with_ghosts + fused_step per step) for every BC combination, both
upwind branches, and both input paths (fused-DMA and assembled) — the
TPU analogue of the reference's exact-stencil unit tests
(reference: tests/simulation/unit/test_diffusion.cpp, test_advection.cpp).
"""



import numpy as np
import jax
import jax.numpy as jnp
import pytest

from climate_sim_tpu.config import BCConfig, BCType, SimConfig
from climate_sim_tpu.ops.boundary import pad_with_ghosts
from climate_sim_tpu.ops.init import gaussian_hotspot
from climate_sim_tpu.ops.pallas_stencil import (
    build_multistep_advance,
    multistep_kernel_step,
    pick_steps_per_pass,
    prepadded_kernel_step,
)
from climate_sim_tpu.ops.step import reference_step

D4 = (BCType.DIRICHLET,) * 4
N4 = (BCType.NEUMANN,) * 4
P4 = (BCType.PERIODIC,) * 4
MIX1 = (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.PERIODIC)
MIX2 = (BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN)


def make_cfg(nx, ny, bcs, *, D=0.05, vx=0.5, vy=-0.25, compat=False):
    cfg = SimConfig(nx=nx, ny=ny, D=D, vx=vx, vy=vy, dt=0.1, steps=8, out_every=4)
    cfg.bc = BCConfig(*bcs)
    cfg.strict_reference_compat = compat
    return cfg


def oracle(u, cfg, steps):
    for _ in range(steps):
        u = reference_step(u, cfg, cfg.dt)
    return u


@pytest.mark.parametrize("shape", [(128, 64), (120, 96)])  # fused-DMA / assembled
@pytest.mark.parametrize("bcs", [D4, N4, P4, MIX1, MIX2])
@pytest.mark.parametrize("k", [1, 3, 8])
def test_multistep_matches_oracle(shape, bcs, k):
    nx, ny = shape
    cfg = make_cfg(nx, ny, bcs)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, k)
    out = multistep_kernel_step(u, cfg, cfg.dt, k, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize(
    "vx,vy,D",
    [(0.0, 0.0, 1.0), (1.0, 0.0, 0.0), (-1.0, 0.5, 0.0), (0.25, -0.75, 0.1)],
)
def test_multistep_upwind_branches(vx, vy, D):
    """Each velocity sign exercises a different upwind weight layout."""
    cfg = make_cfg(128, 64, MIX1, D=D, vx=vx, vy=vy)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 4)
    out = multistep_kernel_step(u, cfg, cfg.dt, 4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_multistep_f64():
    cfg = make_cfg(128, 64, P4)
    u = gaussian_hotspot(cfg, jnp.float64)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-13)


def test_multistep_reference_compat_periodic():
    """compat=True: periodic ghosts stay zero (the reference's silent no-op,
    boundary.cpp has no Periodic branch) — kernel must reproduce it."""
    cfg = make_cfg(128, 64, P4, compat=True)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("bcs", [D4, P4, MIX2])
def test_prepadded_single_step(bcs):
    cfg = make_cfg(96, 72, bcs)
    u = gaussian_hotspot(cfg, jnp.float32)
    up = pad_with_ghosts(u, cfg.bc, 0.0, False)
    out = prepadded_kernel_step(up, cfg, cfg.dt, interpret=True)
    ref = reference_step(u, cfg, cfg.dt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_advance_chunk_with_remainder():
    """chunk not divisible by k: trailing passes use a smaller k."""
    cfg = make_cfg(128, 64, MIX1)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 11)
    advance = build_multistep_advance(cfg, cfg.dt, interpret=True)
    out = advance(11)(u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_pick_steps_per_pass_bounds():
    cfg = make_cfg(4096, 4096, D4)
    assert pick_steps_per_pass(cfg, 100) == 8
    assert pick_steps_per_pass(cfg, 5) == 5
    assert pick_steps_per_pass(make_cfg(128, 64, D4), 100) == 2  # ny//32 cap
    assert pick_steps_per_pass(make_cfg(32, 32, D4), 100) == 1


@pytest.mark.parametrize("shape", [(512, 64), (64, 512), (128, 8), (256, 96)])
def test_multistep_odd_aspect_ratios(shape):
    """Tall-narrow and wide-short grids exercise block pickers and both
    input modes."""
    nx, ny = shape
    cfg = make_cfg(nx, ny, MIX1)
    u = gaussian_hotspot(cfg, jnp.float32)
    k = min(4, ny // 4, nx // 4)
    ref = oracle(u, cfg, k)
    out = multistep_kernel_step(u, cfg, cfg.dt, k, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_periodic_advection_conserves_mass():
    """Donor-cell upwind on a fully periodic domain is conservative; 50
    kernel steps must preserve total mass to f32 accumulation error
    (integration_advection.cpp's 5% gate, much tighter here)."""
    cfg = make_cfg(128, 64, P4, D=0.0, vx=0.8, vy=-0.6)
    u = gaussian_hotspot(cfg, jnp.float32)
    m0 = float(jnp.sum(u.astype(jnp.float64)))
    adv = build_multistep_advance(cfg, cfg.dt, interpret=True)
    out = adv(50)(u)
    m1 = float(jnp.sum(out.astype(jnp.float64)))
    assert abs(m1 - m0) / m0 < 1e-5


def test_neumann_diffusion_conserves_mass():
    """Zero-flux boundaries: diffusion redistributes but never loses mass."""
    cfg = make_cfg(128, 64, N4, D=0.2, vx=0.0, vy=0.0)
    u = gaussian_hotspot(cfg, jnp.float32)
    m0 = float(jnp.sum(u.astype(jnp.float64)))
    adv = build_multistep_advance(cfg, cfg.dt, interpret=True)
    out = adv(50)(u)
    m1 = float(jnp.sum(out.astype(jnp.float64)))
    assert abs(m1 - m0) / m0 < 1e-5


def test_diffusion_maximum_principle():
    """Explicit diffusion within the CFL bound: max never increases, min
    never decreases (integration_diffusion.cpp's peak-decay/positivity
    gate, per-kernel-pass)."""
    cfg = make_cfg(128, 64, MIX1, D=0.2, vx=0.0, vy=0.0)
    u = gaussian_hotspot(cfg, jnp.float32)
    adv = build_multistep_advance(cfg, cfg.dt, interpret=True)
    prev_max, prev_min = 1.0 + 1e-6, -1e-6
    for _ in range(5):
        u = adv(8)(u)
        cur_max = float(jnp.max(u))
        cur_min = float(jnp.min(u))
        assert cur_max <= prev_max + 1e-6
        assert cur_min >= prev_min - 1e-6
        prev_max, prev_min = cur_max, cur_min
    assert cur_max < 0.9  # peak actually decayed


@pytest.mark.parametrize("bcs", [D4, P4, MIX1])
def test_multistep_x_blocked_grid(bcs):
    """nx > the preferred x-block width: the 2D block grid with neighbor
    ghost strips and (bx, by)-gated fixups must match the oracle."""
    from climate_sim_tpu.ops import pallas_stencil as ps

    assert ps._PREF_BX < 4096
    cfg = make_cfg(4096, 64, bcs)  # nbx = 2 at the default _PREF_BX
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def _edge_parked_field(cfg, seed=0):
    """Random mass hard against all four edges (centered hotspots decay to
    ~0 at the boundary and mask edge-lane bugs — a prior fuzz lesson)."""
    rng = np.random.default_rng(seed)
    u0 = np.zeros((cfg.ny, cfg.nx), np.float32)
    u0[:, :3] = rng.random((cfg.ny, 3))
    u0[:, -3:] = rng.random((cfg.ny, 3))
    u0[:3, :] = rng.random((3, cfg.nx))
    u0[-3:, :] = rng.random((3, cfg.nx))
    return jnp.asarray(u0)


@pytest.mark.parametrize(
    "bcs",
    [
        (BCType.NEUMANN, BCType.NEUMANN, BCType.DIRICHLET, BCType.DIRICHLET),
        (BCType.DIRICHLET, BCType.NEUMANN, BCType.NEUMANN, BCType.PERIODIC),
        (BCType.PERIODIC, BCType.PERIODIC, BCType.NEUMANN, BCType.DIRICHLET),
        # one-sided-y ghost-row schedule + select x sides on a blocked grid
        (BCType.NEUMANN, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET),
    ],
)
def test_x_blocked_grid_edge_parked_mass(bcs):
    """x-blocked grids (nbx > 1) with mass parked against the edges: the
    lane-masked select x-fixups must fire only on physical-edge blocks
    (bx gating) and reproduce the oracle's ghost values exactly."""
    from climate_sim_tpu.ops import pallas_stencil as ps

    assert ps._PREF_BX < 4096
    cfg = make_cfg(4096, 64, bcs)  # nbx = 2 at the default _PREF_BX
    u = _edge_parked_field(cfg)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_seeded_fuzz_matches_oracle():
    """Seeded random sweep over grids (incl. non-128-multiples), anisotropic
    spacings, BC mixes, compat, and pass sizes — a standing corner-case net
    (a 40-trial ad-hoc fuzz found zero failures; this keeps 6 fast trials)."""
    import random

    rng = random.Random(20260817)
    bcs_pool = [BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC]
    for _trial in range(6):
        nx = rng.choice([40, 96, 128, 136, 200])
        ny = rng.choice([24, 64, 96, 130])
        D = rng.choice([0.0, 0.1, 0.24])
        vx = rng.choice([0.0, -0.7, 1.0])
        vy = rng.choice([0.5, -0.5, 0.9])
        dx = rng.choice([0.5, 1.0, 2.0])
        dy = rng.choice([0.5, 1.0, 2.0])
        # Sample inside the COMBINED advection+diffusion bound (positivity
        # of the update), not the reference's min-of-envelopes safe_dt:
        # between the two the scheme genuinely diverges and any f32
        # comparison loses meaning (docs/numerics.md §Stability).
        denom = abs(vx) / dx + abs(vy) / dy + 2 * D * (1 / dx**2 + 1 / dy**2)
        dt = 0.9 / denom if denom > 0 else 0.1
        k = rng.choice([2, 5, 8])
        cfg = SimConfig(nx=nx, ny=ny, dx=dx, dy=dy, D=D, vx=vx, vy=vy,
                        dt=dt, steps=8, out_every=8)
        cfg.bc = BCConfig(*[rng.choice(bcs_pool) for _ in range(4)])
        cfg.strict_reference_compat = rng.random() < 0.25
        u = gaussian_hotspot(cfg, jnp.float32)
        # Half the trials park extra mass against an edge: centered
        # hotspots decay to ~0 at the boundary and mask edge-handling
        # bugs (a 400-trial fuzz only caught the one-sided-periodic
        # contamination on grids small enough for the bump to reach it).
        if rng.random() < 0.5:
            axis = rng.choice([0, 1])
            u = u + 0.5 * jnp.roll(u, u.shape[axis] // 2 - 2, axis=axis)
        ref = oracle(u, cfg, k)
        out = multistep_kernel_step(u, cfg, cfg.dt, k, interpret=True)
        if out is None:
            continue
        scale = max(1.0, float(jnp.abs(ref).max()))
        err = float(jnp.abs(out - ref).max()) / scale
        assert err < 3e-5, (nx, ny, dx, dy, D, vx, vy, dt, k,
                            cfg.strict_reference_compat, err)


@pytest.mark.parametrize("form", ["trapezoid", "fullslab", "mxu", "chain"])
def test_substep_override_forms_match_oracle(form, monkeypatch):
    """All sub-step forms stay live behind CLIMATE_SIM_SUBSTEP and agree
    with the oracle on the fused-DMA path (the A/B knob docs/performance.md
    relies on; 'mxu' is the measured-negative MXU-hybrid experiment —
    interpret mode checks the circulant construction, hardware accuracy
    is precision-dependent, see docs/performance.md)."""
    monkeypatch.setenv("CLIMATE_SIM_SUBSTEP", form)
    cfg = make_cfg(128, 64, MIX1)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("bcs", [D4, N4, MIX1, MIX2, P4,
                                 (BCType.NEUMANN, BCType.DIRICHLET,
                                  BCType.PERIODIC, BCType.DIRICHLET)])
def test_chained_substep_matches_oracle_all_fixup_mixes(bcs, monkeypatch):
    """The value-chained form (the default for every full-slab build since
    the 2-y-fixup A/B win — forced here so the coverage survives future
    gate changes) must match the oracle for every y-fixup count (0, 1, 2)
    and kind (dirichlet, neumann, sched via the one-sided-periodic mix),
    since the y fixups ride sublane-masked roll selects instead of ref row
    writes."""
    monkeypatch.setenv("CLIMATE_SIM_SUBSTEP", "chain")
    cfg = make_cfg(128, 64, bcs)
    u = gaussian_hotspot(cfg, jnp.float32)
    # park mass against the edges so boundary handling is load-bearing
    u = u + 0.5 * jnp.roll(u, u.shape[0] // 2 - 2, axis=0)
    u = u + 0.25 * jnp.roll(u, u.shape[1] // 2 - 2, axis=1)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("bcs", [
    P4,                                                      # full torus
    (BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN),
    (BCType.PERIODIC, BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET),
])
def test_padless_wrap_x_matches_oracle(bcs):
    """Two-sided-periodic-x full-width builds go padless: the circular
    lane roll IS the periodic neighbor (no strips, no selects, no x
    staleness).  Mass is parked against the x edge so the wrap is
    load-bearing; 16 steps = 2 full k=8 passes."""
    cfg = make_cfg(256, 64, bcs)
    u = gaussian_hotspot(cfg, jnp.float32)
    u = u + 0.5 * jnp.roll(u, u.shape[1] // 2 - 2, axis=1)
    ref = oracle(u, cfg, 16)
    out = multistep_kernel_step(u, cfg, cfg.dt, 16, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_chain_geometry_width_cap():
    """The chain-geometry scorer pins the hardware-measured winners:
    padless full-width up to the W=5120 locality knee (229.6/231.6 Gpt/s
    at 4096²/5120²) but the largest under-cap divisor past it (6144²
    onward, where full width measured 8-12% slower — VMEM locality;
    docs/performance.md)."""
    from climate_sim_tpu.ops.pallas_stencil import _chain_geometry

    # under the knee: padless full-width, BY=256
    assert _chain_geometry(2048, 2048, 8, 4, True, 2048) == (2048, 256)
    assert _chain_geometry(4096, 4096, 8, 4, True, 2048) == (4096, 256)
    assert _chain_geometry(5120, 5120, 8, 4, True, 1280) == (5120, 256)
    assert _chain_geometry(4864, 4096, 8, 4, True, 2432) == (4864, 256)
    # past the knee: the cap rejects full width; the largest under-cap
    # divisor is generated as the intermediate candidate and wins
    assert _chain_geometry(6144, 6144, 8, 4, True, 2048) == (3072, 256)
    assert _chain_geometry(7168, 7168, 8, 4, True, 1792) == (3584, 256)
    assert _chain_geometry(8192, 8192, 8, 4, True, 2048) == (4096, 256)
    assert _chain_geometry(16384, 16384, 8, 4, True, 2048) == (4096, 256)
    # no padless (wrap-x): full-width carries pads, W=8448 over the cap
    assert _chain_geometry(8192, 8192, 8, 4, False, 2048) == (4096, 256)
    # awkward width (4992 = 128*39): padless full width fits the cap
    assert _chain_geometry(4992, 64, 8, 4, True, 4992) == (4992, 64)


def test_substep_override_rejects_typos(monkeypatch):
    monkeypatch.setenv("CLIMATE_SIM_SUBSTEP", "trapezoidal")
    cfg = make_cfg(128, 64, D4)
    u = gaussian_hotspot(cfg, jnp.float32)
    with pytest.raises(ValueError, match="CLIMATE_SIM_SUBSTEP"):
        multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)


ONE_SIDED = [
    # (bcs(l,r,b,t), axis-to-shift-hotspot)
    ((BCType.PERIODIC, BCType.NEUMANN, BCType.DIRICHLET, BCType.DIRICHLET), 1),
    ((BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET, BCType.DIRICHLET), 1),
    ((BCType.DIRICHLET, BCType.DIRICHLET, BCType.PERIODIC, BCType.NEUMANN), 0),
    ((BCType.DIRICHLET, BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC), 0),
]


@pytest.mark.parametrize("bcs,axis", ONE_SIDED)
def test_one_sided_periodic_matches_oracle(bcs, axis):
    """Exactly one side of an axis periodic (the reference's own dev.yaml
    mixes bottom=periodic top=dirichlet): the wrap ghost must track the
    opposite edge's CURRENT line every step.  Fused at full k by live
    wrap data + the wrap_*_mask consumer patches (padless x wraps through
    the roll itself); must stay oracle-exact.  (Regression: naive k=8
    torus fusion contaminated the periodic-edge rows/cols at ~1e-3 for
    hotspots near the edge.)"""
    cfg = make_cfg(128, 64, bcs, vx=1.0, vy=0.5)
    u = gaussian_hotspot(cfg, jnp.float32)
    # park mass against the periodic edge so contamination is visible
    u = u + 0.5 * jnp.roll(u, u.shape[axis] // 2 - 2, axis=axis)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_one_sided_periodic_chunks_fuse_full_k():
    """One-sided configs fuse at full k through whole chunk programs:
    both y orientations, an x-blocked grid (nbx > 1: the wrap patches
    must gate on block position), x one-sidedness in both orientations
    (direct padless, no transposes), and remainder passes; mass parked
    against the periodic edge."""
    from climate_sim_tpu.ops.pallas_stencil import build_multistep_advance

    cases = [
        # (nx, ny, bcs, park-axis)
        (256, 256, (BCType.DIRICHLET, BCType.DIRICHLET, BCType.PERIODIC, BCType.NEUMANN), 0),
        (256, 256, (BCType.DIRICHLET, BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC), 0),
        # x both-periodic (wrap corners) + x-blocked grid
        (4096, 64, (BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET, BCType.PERIODIC), 0),
        # one-sided x, both orientations + a torus-y corner case
        (256, 384, (BCType.PERIODIC, BCType.NEUMANN, BCType.DIRICHLET, BCType.DIRICHLET), 1),
        (256, 384, (BCType.DIRICHLET, BCType.PERIODIC, BCType.PERIODIC, BCType.PERIODIC), 1),
    ]
    for nx, ny, bcs, axis in cases:
        cfg = make_cfg(nx, ny, bcs, vx=0.3, vy=-0.5)
        u = gaussian_hotspot(cfg, jnp.float32)
        u = u + 0.5 * jnp.roll(u, u.shape[axis] // 2 - 2, axis=axis)
        ref = oracle(u, cfg, 19)
        adv = build_multistep_advance(cfg, cfg.dt, interpret=True)
        out = adv(19)(u)  # 2 x k=8 passes + a kk=3 remainder
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=5e-5,
            err_msg=f"{nx}x{ny} {bcs}",
        )


def test_one_sided_periodic_y_odd_grid_falls_back_stepwise():
    """Grids the fused-DMA layout cannot fit (nx not a 128-multiple) fall
    back to exact single-step passes for one-sided-y configs."""
    bcs = (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET)
    cfg = make_cfg(120, 48, bcs, vx=0.3, vy=-0.5)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_one_sided_periodic_fuses_pass_size():
    """pick_steps_per_pass no longer caps one-sided-periodic configs: every
    production layout fuses them at full k via the wrap consumer patches
    (the r02-r03 y_sched/x_sched cap flags are gone with the schedule
    machinery); the extent-safety floor still applies."""
    from climate_sim_tpu.ops.pallas_stencil import (
        one_sided_periodic,
        one_sided_periodic_x,
        one_sided_periodic_y,
        pick_steps_per_pass,
    )

    cfg = make_cfg(128, 64, ONE_SIDED[0][0])  # one-sided in x
    assert one_sided_periodic(cfg) and one_sided_periodic_x(cfg)
    assert pick_steps_per_pass(cfg, 100) == 2  # extent floor: 64 // 32
    # one-sided in y fuses at the full default depth
    cfgy = make_cfg(256, 256, ONE_SIDED[2][0])
    assert one_sided_periodic_y(cfgy) and not one_sided_periodic_x(cfgy)
    assert pick_steps_per_pass(cfgy, 100) == 8
    # both axes one-sided fuse too
    cfgb = make_cfg(256, 256, BOTH_AXES[0])
    assert one_sided_periodic_x(cfgb) and one_sided_periodic_y(cfgb)
    assert pick_steps_per_pass(cfgb, 100) == 8
    # both-sides-periodic and compat mixes fuse as always
    cfg2 = make_cfg(256, 256, P4)
    assert not one_sided_periodic(cfg2)
    assert pick_steps_per_pass(cfg2, 100) == 8
    cfg3 = make_cfg(128, 64, ONE_SIDED[0][0], compat=True)
    assert not one_sided_periodic(cfg3)


BOTH_AXES = [
    # all four corner orientations (periodic side of y x periodic side of x)
    (BCType.PERIODIC, BCType.DIRICHLET, BCType.PERIODIC, BCType.NEUMANN),
    (BCType.PERIODIC, BCType.NEUMANN, BCType.NEUMANN, BCType.PERIODIC),
    (BCType.DIRICHLET, BCType.PERIODIC, BCType.PERIODIC, BCType.DIRICHLET),
    (BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET, BCType.PERIODIC),
]


@pytest.mark.parametrize("bcs", BOTH_AXES)
def test_both_axes_one_sided_fuses_full_k(bcs):
    """BOTH axes one-sided-periodic fuse at full k: the wrap blocks of
    both axes arrive with the input and the kernel applies both axes'
    wrap consumer patches (composing on the corner wrap data).
    k = 8 = khalo runs the creep margins at zero slack; mass
    is parked against every edge so corner contamination is visible."""
    cfg = make_cfg(256, 256, bcs, vx=0.3, vy=-0.5)
    assert pick_steps_per_pass(cfg, 16) == 8
    u = gaussian_hotspot(cfg, jnp.float32)
    u = (
        u
        + 0.5 * jnp.roll(u, cfg.ny // 2 - 2, axis=0)
        + 0.5 * jnp.roll(u, cfg.nx // 2 - 2, axis=1)
    )
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_both_axes_one_sided_chunk_and_blocked_grids():
    """Both-axes scheduled fusion through the chunk advance (k=8 passes +
    a kk=3 remainder) and on multi-block grids (nbx > 1 wide: dynamic
    row-schedule windows; nby > 1 tall: dynamic column-schedule
    windows)."""
    cases = [
        (256, 256, 19),   # single block, remainder pass
        (2560, 64, 4),    # nbx = 2 (BX = 1280)
        (128, 2048, 4),   # nby = 4 (BY = 512)
    ]
    for nx, ny, steps in cases:
        cfg = make_cfg(nx, ny, BOTH_AXES[0], vx=-0.7, vy=0.9)
        u = gaussian_hotspot(cfg, jnp.float32)
        u = (
            u
            + 0.5 * jnp.roll(u, ny // 2 - 2, axis=0)
            + 0.5 * jnp.roll(u, nx // 2 - 2, axis=1)
        )
        ref = oracle(u, cfg, steps)
        adv = build_multistep_advance(cfg, cfg.dt, interpret=True)
        np.testing.assert_allclose(
            np.asarray(adv(steps)(u)), np.asarray(ref), atol=5e-5,
            err_msg=f"{nx}x{ny}",
        )


def test_both_axes_one_sided_odd_grid_falls_back_stepwise():
    """Grids the fused-DMA layout cannot fit fall back to exact
    single-step passes for both-axes-one-sided configs."""
    cfg = make_cfg(120, 48, BOTH_AXES[2], vx=0.3, vy=-0.5)
    u = gaussian_hotspot(cfg, jnp.float32)
    ref = oracle(u, cfg, 8)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)


def test_one_sided_x_direct_column_schedule_kernel():
    """One-sided-periodic-x alone also fuses at the KERNEL level via the
    ghost-COLUMN schedule (no transpose; the chunk advance may still
    prefer the transposed layout), including with a two-sided-periodic y
    axis (wrap rows in the column schedule's strip evolution)."""
    for bcs in [
        (BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN, BCType.DIRICHLET),
        (BCType.DIRICHLET, BCType.PERIODIC, BCType.PERIODIC, BCType.PERIODIC),
    ]:
        cfg = make_cfg(256, 128, bcs, vx=-0.7, vy=0.9)
        u = gaussian_hotspot(cfg, jnp.float32)
        u = u + 0.5 * jnp.roll(u, cfg.nx // 2 - 2, axis=1)
        ref = oracle(u, cfg, 4)
        out = multistep_kernel_step(u, cfg, cfg.dt, 4, interpret=True)
        assert out is not None
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5, err_msg=str(bcs)
        )


def test_bf16_storage_mode_single_device():
    """precision=bf16 is a REAL Pallas mode now: the chained kernel builds
    for bf16 (16-sublane tiles — khalo/BY/ny on the 16-row tile) and runs
    bf16-STORAGE numerics: the chain computes in f32 and rounds to bf16
    once per k-step pass, so the error vs the f32 oracle stays at
    single-rounding scale (~2^-8 on an O(1) field), NOT bf16-arithmetic
    scale (~10x larger, measured 0.042 vs 0.0032 at 8 steps)."""
    from climate_sim_tpu.ops.pallas_stencil import multistep_kernel_step
    from climate_sim_tpu.ops.step import reference_step

    cfg = make_cfg(256, 256, MIX1)
    u = gaussian_hotspot(cfg, jnp.bfloat16)
    # interpret mode: the suite's global x64 flag disqualifies hardware
    # builds for every dtype; bf16 hardware lowering is covered by the
    # hw_conformance bf16 rows on the real chip.
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None, "bf16 no longer builds a Pallas layout"
    assert out.dtype == jnp.bfloat16
    ref = gaussian_hotspot(cfg, jnp.float32)
    for _ in range(8):
        ref = reference_step(ref, cfg, cfg.dt)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert d.max() < 8e-3, f"bf16 storage-mode error too large: {d.max()}"


def test_bf16_sharded_slab_path():
    """The sharded slab path carries bf16 too (16-wide slabs, khalo=16)."""
    from climate_sim_tpu.ops.init import gaussian_hotspot as gh
    from climate_sim_tpu.ops.step import reference_step
    from climate_sim_tpu.parallel.halo import build_sharded_multistep_advance
    from climate_sim_tpu.parallel.mesh import field_sharding, make_mesh

    cfg = make_cfg(256, 256, MIX1)
    mesh = make_mesh(2, 2, jax.devices()[:4])
    adv = build_sharded_multistep_advance(
        cfg, mesh, cfg.dt, interpret=True, dtype_name="bfloat16"
    )
    assert adv is not None
    u = jax.device_put(gh(cfg, jnp.bfloat16), field_sharding(mesh))
    out = adv(8)(u)
    ref = gh(cfg, jnp.float32)
    for _ in range(8):
        ref = reference_step(ref, cfg, cfg.dt)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert d.max() < 8e-3, f"bf16 sharded slab error too large: {d.max()}"


def test_bf16_storage_semantics_in_every_fallback(monkeypatch):
    """Every jnp path a bf16 run can fall to must use fused_step_storage
    (f32 arithmetic, one rounding per step) — raw bf16 stencil arithmetic
    is ~4-10x worse and must be unreachable (code-review finding)."""
    from climate_sim_tpu.ops.stencil import fused_step, fused_step_storage

    cfg = make_cfg(64, 64, MIX1)
    u = gaussian_hotspot(cfg, jnp.float32)
    up = pad_with_ghosts(u, cfg.bc, 0.0, False)
    want = fused_step(up, cfg.D, cfg.vx, cfg.vy, cfg.dt, cfg.dx, cfg.dy)
    got = fused_step_storage(
        up.astype(jnp.bfloat16), cfg.D, cfg.vx, cfg.vy, cfg.dt, cfg.dx, cfg.dy
    )
    assert got.dtype == jnp.bfloat16
    # one storage rounding + IC cast, NOT per-op bf16 error
    d = np.abs(np.asarray(got, np.float32) - np.asarray(want))
    assert d.max() < 6e-3

    # the store/trapezoid kernel forms decline bf16 in interpret mode too
    # (CPU parity with the hardware decline)
    from climate_sim_tpu.ops.pallas_stencil import multistep_kernel_step

    monkeypatch.setenv("CLIMATE_SIM_SUBSTEP", "fullslab")
    out = multistep_kernel_step(
        gaussian_hotspot(cfg, jnp.bfloat16), cfg, cfg.dt, 8, interpret=True
    )
    assert out is None, "non-chained bf16 form must decline everywhere"


def test_one_sided_x_runs_direct_padless_no_transpose():
    """One-sided-periodic-x advances run DIRECTLY on the padless layout —
    the circular roll's wrap is the periodic neighbor and the fixed
    side's ordinary select is the barrier — with no transposes in the
    program (the r03 transpose-onto-y-schedule route and its
    CLIMATE_SIM_X_SCHED knob were removed with the schedules)."""
    cfg = make_cfg(256, 128, (BCType.PERIODIC, BCType.DIRICHLET,
                              BCType.NEUMANN, BCType.DIRICHLET))
    u = gaussian_hotspot(cfg, jnp.float32)
    adv = build_multistep_advance(cfg, cfg.dt, interpret=True)
    out = adv(16)(u)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(oracle(u, cfg, 16)), atol=5e-5
    )
    jaxpr = jax.make_jaxpr(adv(16))(u)
    names = {e.primitive.name for e in jaxpr.jaxpr.eqns}

    def walk(jx, acc):
        from jax._src import core as jcore
        for e in jx.eqns:
            acc.add(e.primitive.name)
            for v in e.params.values():
                items = v if isinstance(v, (list, tuple)) else (v,)
                for s in items:
                    if isinstance(s, jcore.ClosedJaxpr):
                        walk(s.jaxpr, acc)
                    elif isinstance(s, jcore.Jaxpr):
                        walk(s, acc)
        return acc

    assert "transpose" not in walk(jaxpr.jaxpr, set(names))


@pytest.mark.parametrize("bcs", [
    (BCType.DIRICHLET, BCType.NEUMANN, BCType.PERIODIC, BCType.DIRICHLET),
    (BCType.PERIODIC, BCType.DIRICHLET, BCType.NEUMANN, BCType.DIRICHLET),
    (BCType.PERIODIC, BCType.DIRICHLET, BCType.PERIODIC, BCType.NEUMANN),
])
def test_bf16_one_sided_periodic_fuses(bcs):
    """bf16 STORAGE mode x one-sided-periodic: the wrap consumer patches
    live in the chained form bf16 builds require, so these configs fuse
    at full k in bf16 too (16-sublane tiles, khalo=16).  Error vs the f32
    oracle stays at the one-rounding-per-pass scale, same budget as the
    coherent bf16 tests."""
    from climate_sim_tpu.ops.pallas_stencil import multistep_kernel_step

    cfg = make_cfg(256, 256, bcs)
    u32 = gaussian_hotspot(cfg, jnp.float32)
    u32 = u32 + 0.4 * jnp.roll(u32, cfg.ny // 2 - 2, 0) \
              + 0.4 * jnp.roll(u32, cfg.nx // 2 - 2, 1)
    u = u32.astype(jnp.bfloat16)
    out = multistep_kernel_step(u, cfg, cfg.dt, 8, interpret=True)
    assert out is not None, "bf16 one-sided no longer builds a Pallas layout"
    assert out.dtype == jnp.bfloat16
    ref = u32
    for _ in range(8):
        ref = reference_step(ref, cfg, cfg.dt)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref))
    assert d.max() < 1.6e-2, f"bf16 one-sided error too large: {d.max()}"
