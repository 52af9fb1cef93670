"""Mesh + halo-exchange tests on the 8-device virtual CPU mesh
(reference analogues: test_decomp_mpi.cpp, test_halo.cpp)."""


import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax import lax
from jax.sharding import PartitionSpec

from climate_sim_tpu.config import BCConfig, BCType, SimConfig
from climate_sim_tpu.ops.step import build_single_device_advance, make_interior_step
from climate_sim_tpu.parallel.halo import build_sharded_advance, exchange_and_pad
from climate_sim_tpu.parallel.mesh import (
    choose_mesh_shape,
    dims_create,
    divisible,
    field_sharding,
    make_mesh,
)
from oracle import gaussian_ic

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_dims_create_near_square():
    """dims product == size, near-square (py is the largest factor <=
    sqrt(n), the MPI_Dims_create contract), px >= py
    (reference: test_decomp_mpi.cpp:6-35)."""
    import math

    for n in range(1, 33):
        px, py = dims_create(n)
        assert px * py == n
        assert px >= py
        best_py = max(d for d in range(1, int(math.isqrt(n)) + 1) if n % d == 0)
        assert py == best_py, (n, px, py)


def test_choose_mesh_prefers_divisible():
    assert choose_mesh_shape(8, 1024, 1024) == (4, 2)
    assert choose_mesh_shape(4, 64, 64) == (2, 2)
    # indivisible near-square: picks another factorization that divides
    px, py = choose_mesh_shape(6, 96, 96)
    assert px * py == 6 and 96 % px == 0 and 96 % py == 0
    # explicit request honored
    assert choose_mesh_shape(8, 64, 64, req_x=8) == (8, 1)
    with pytest.raises(ValueError):
        choose_mesh_shape(8, 64, 64, req_x=3)


def test_topology_aware_grid_fallbacks():
    """Topology-aware layout engages only on real TPU device sets; virtual
    CPU devices (and fakes the mesh utils reject) fall back to
    enumeration-order reshape, which make_mesh must always produce
    correctly."""
    from climate_sim_tpu.parallel.mesh import _topology_aware_grid

    devs = jax.devices()[:8]
    # CPU/virtual devices carry no ICI topology -> None.
    assert _topology_aware_grid(devs, 2, 4) is None

    class _FakeTpu:
        platform = "tpu"
        process_index = 0

    # Claims to be TPU but mesh_utils can't map it -> except-path None.
    assert _topology_aware_grid([_FakeTpu() for _ in range(8)], 2, 4) is None

    # Fallback reshape: row-major (y, x) enumeration order, all devices used.
    mesh = make_mesh(4, 2)
    assert mesh.devices.shape == (2, 4)
    assert [d.id for d in mesh.devices.flat] == [d.id for d in devs]
    # Single-device mesh skips the topology path entirely.
    m1 = make_mesh(1, 1, jax.devices()[:1])
    assert m1.devices.shape == (1, 1)


def test_topology_aware_grid_hybrid_dispatch(monkeypatch):
    """Multi-slice device sets route through create_hybrid_device_mesh with
    the DCN crossing pinned to y (x when y doesn't divide), slices counted
    by slice_index; hybrid failure falls back to the flat ICI-aware layout."""
    from jax.experimental import mesh_utils

    from climate_sim_tpu.parallel.mesh import _topology_aware_grid

    class FakeDev:
        platform = "tpu"

        def __init__(self, slice_index, process_index=0):
            self.slice_index = slice_index
            self.process_index = process_index

    calls = []

    def fake_hybrid(ici, dcn, devices=None, process_is_granule=False):
        calls.append(("hybrid", tuple(ici), tuple(dcn), process_is_granule))
        return np.empty((ici[0] * dcn[0], ici[1] * dcn[1]), dtype=object)

    def fake_flat(shape, devices=None, contiguous_submeshes=False):
        calls.append(("flat", tuple(shape)))
        return np.empty(shape, dtype=object)

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", fake_hybrid)
    monkeypatch.setattr(mesh_utils, "create_device_mesh", fake_flat)

    # 2 slices x 4 devices, y divisible by slices -> DCN on y.
    devs = [FakeDev(s) for s in (0, 0, 0, 0, 1, 1, 1, 1)]
    grid = _topology_aware_grid(devs, 4, 2)
    assert grid.shape == (4, 2)
    assert calls[-1] == ("hybrid", (2, 2), (2, 1), False)

    # y NOT divisible by slices, x divisible -> DCN on x.
    grid = _topology_aware_grid([FakeDev(s) for s in (0, 0, 0, 1, 1, 1)], 3, 2)
    assert grid.shape == (3, 2)
    assert calls[-1] == ("hybrid", (3, 1), (1, 2), False)

    # neither axis divisible by the 2 slices -> straight to flat layout.
    grid = _topology_aware_grid(
        [FakeDev(s % 2) for s in range(15)], 5, 3
    )
    assert calls[-1] == ("flat", (5, 3))

    # single slice -> flat layout, no hybrid call.
    calls.clear()
    grid = _topology_aware_grid([FakeDev(0) for _ in range(8)], 2, 4)
    assert calls == [("flat", (2, 4))]

    # no slice_index attr -> process granules.
    class FakeDevNoSlice:
        platform = "tpu"

        def __init__(self, process_index):
            self.process_index = process_index

    grid = _topology_aware_grid([FakeDevNoSlice(p // 4) for p in range(8)], 4, 2)
    assert calls[-1] == ("hybrid", (2, 2), (2, 1), True)

    # hybrid blow-up falls back to the flat ICI-aware layout.
    def raising_hybrid(*a, **k):
        raise ValueError("granule mismatch")

    monkeypatch.setattr(mesh_utils, "create_hybrid_device_mesh", raising_hybrid)
    calls.clear()
    grid = _topology_aware_grid([FakeDev(s) for s in (0, 0, 0, 0, 1, 1, 1, 1)], 4, 2)
    assert grid is not None and calls == [("flat", (4, 2))]

    # flat blow-up -> None (caller reshapes in enumeration order).
    def raising_flat(*a, **k):
        raise ValueError("no topology")

    monkeypatch.setattr(mesh_utils, "create_device_mesh", raising_flat)
    assert _topology_aware_grid([FakeDev(0) for _ in range(8)], 2, 4) is None


def test_halo_exchange_rank_id_faces():
    """Each shard holds its linear id; after exchange each ghost face equals
    the neighbor's id (reference: test_halo.cpp:8-63)."""
    mesh = make_mesh(4, 2)  # px=4, py=2
    cfg = SimConfig(nx=16, ny=8)
    cfg.bc = BCConfig(*(BCType.PERIODIC,) * 4)

    def body(u_local):
        xi = lax.axis_index("x")
        yi = lax.axis_index("y")
        rank = (yi * 4 + xi).astype(u_local.dtype)
        u_local = jnp.zeros_like(u_local) + rank
        return exchange_and_pad(u_local, cfg, px=4, py=2)

    f = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=PartitionSpec("y", "x"),
            out_specs=PartitionSpec("y", "x"),
        )
    )
    u = jnp.zeros((8, 16), dtype=jnp.float64)
    u = jax.device_put(u, field_sharding(mesh))
    padded = np.asarray(f(u))  # global (8+2*2, 16+2*4) = stacked local tiles

    # Check one interior shard: shard (yi=0, xi=1) occupies padded rows 0:6,
    # cols 6:12 in the stacked layout (local tiles are (4+2, 4+2)).
    tile = padded[0:6, 6:12]
    assert np.all(tile[1:-1, 1:-1] == 1.0)        # own rank id
    assert np.all(tile[1:-1, 0] == 0.0)           # left neighbor rank 0
    assert np.all(tile[1:-1, -1] == 2.0)          # right neighbor rank 2
    assert np.all(tile[-1, 1:-1] == 5.0)          # up neighbor rank 5
    assert np.all(tile[0, 1:-1] == 5.0)           # periodic wrap down -> rank 5


@pytest.mark.parametrize("bcs", ["dddd", "nnnn", "pppp", "dnpd", "pdnp"])
@pytest.mark.parametrize("meshdims", [(4, 2), (2, 4), (8, 1), (1, 8), (2, 2)])
def test_sharded_matches_single_device(bcs, meshdims):
    """The explicitly-sharded step must reproduce the single-device result
    bit-for-bit in f64 for every BC mix and mesh shape."""
    BC = {"d": BCType.DIRICHLET, "n": BCType.NEUMANN, "p": BCType.PERIODIC}
    px, py = meshdims
    nx, ny = 32, 16
    cfg = SimConfig(nx=nx, ny=ny, D=0.1, vx=0.5, vy=-0.3, dt=0.4)
    cfg.precision = "f64"
    cfg.kernel = "jnp"
    cfg.bc = BCConfig(left=BC[bcs[0]], right=BC[bcs[1]],
                      bottom=BC[bcs[2]], top=BC[bcs[3]])
    dt = 0.4
    steps = 12

    u0 = jnp.asarray(gaussian_ic(nx, ny), dtype=jnp.float64)

    single = build_single_device_advance(cfg, dt)
    want = np.asarray(single(steps)(u0))

    mesh = make_mesh(px, py)
    assert divisible(mesh, nx, ny)
    interior = make_interior_step(cfg, dt)
    advance = build_sharded_advance(cfg, mesh, dt, interior)
    u_sharded = jax.device_put(u0, field_sharding(mesh))
    got = np.asarray(advance(steps)(u_sharded))

    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_sharded_compat_mode_matches():
    cfg = SimConfig(nx=32, ny=32, D=0.1, vx=0.3, vy=0.3, dt=0.5)
    cfg.precision = "f64"
    cfg.kernel = "jnp"
    cfg.bc = BCConfig(*(BCType.PERIODIC,) * 4)
    cfg.strict_reference_compat = True
    dt = 0.5

    u0 = jnp.asarray(gaussian_ic(32, 32), dtype=jnp.float64)
    want = np.asarray(build_single_device_advance(cfg, dt)(10)(u0))

    mesh = make_mesh(4, 2)
    advance = build_sharded_advance(cfg, mesh, dt, make_interior_step(cfg, dt))
    got = np.asarray(advance(10)(jax.device_put(u0, field_sharding(mesh))))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-13)


def test_padded_gspmd_advance_matches_oracle():
    """Grids indivisible along BOTH mesh axes run in a padded carrier of
    the next mesh-multiple shape (decision log #6's padding alternative;
    reference remainder analogue: decomp.cpp:29-30) — exact vs the oracle,
    all BC kinds incl. a one-sided-periodic axis."""
    from climate_sim_tpu.ops.step import reference_step
    from climate_sim_tpu.parallel.halo import build_padded_gspmd_advance

    cfg = SimConfig(nx=53, ny=67, dx=1.0, dy=0.5, D=0.1, vx=-0.7, vy=0.9,
                    dt=0.05, steps=12, out_every=12)
    cfg.bc = BCConfig(BCType.DIRICHLET, BCType.NEUMANN,
                      BCType.PERIODIC, BCType.DIRICHLET)
    mesh = make_mesh(4, 2)
    assert not divisible(mesh, cfg.nx, cfg.ny)
    u0 = jnp.asarray(gaussian_ic(cfg.nx, cfg.ny), dtype=jnp.float64)
    want = u0
    for _ in range(12):
        want = reference_step(want, cfg, cfg.dt)
    got = build_padded_gspmd_advance(cfg, mesh, cfg.dt)(12)(u0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-13)


def test_overlap_interior_kernel_independent_of_ppermutes():
    """Structural proof of the overlap claim: in the overlap pass's jaxpr,
    the INTERIOR region kernel has no (transitive) data dependency on any
    ``ppermute`` — XLA's latency-hiding scheduler is therefore free to run
    it concurrently with the face exchanges (the nonblocking
    Isend/Irecv-overlap analogue, halo.cpp:28-46), while the four edge-band
    kernels DO consume the exchanged halos.  Timing cannot demonstrate this
    on the host-serialized virtual mesh; the dataflow graph can."""
    from jax._src import core as jcore

    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.parallel.halo import build_sharded_overlap_advance

    # 256² tiles -> k=8, so the 8-step chunk is exactly ONE pass (taint
    # legitimately crosses pass boundaries via the stitched tile).
    cfg = SimConfig(
        nx=1024, ny=512, D=0.05, vx=0.5, vy=-0.25, dt=0.1, steps=8, out_every=8
    )
    cfg.bc = BCConfig(
        BCType.DIRICHLET, BCType.NEUMANN, BCType.DIRICHLET, BCType.NEUMANN
    )
    mesh = make_mesh(4, 2)
    adv = build_sharded_overlap_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    u = jax.device_put(
        gaussian_hotspot(cfg, jnp.float32), field_sharding(mesh)
    )
    jaxpr = jax.make_jaxpr(adv(8))(u)

    def subjaxprs(params):
        for v in params.values():
            items = v if isinstance(v, (list, tuple)) else (v,)
            for s in items:
                if isinstance(s, jcore.ClosedJaxpr):
                    yield s.jaxpr
                elif isinstance(s, jcore.Jaxpr):
                    yield s

    # The shard_map body holds the per-pass graph.
    def find_shard_map_body(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "shard_map":
                return next(iter(subjaxprs(eqn.params)))
            for s in subjaxprs(eqn.params):
                r = find_shard_map_body(s)
                if r is not None:
                    return r
        return None

    body = find_shard_map_body(jaxpr.jaxpr)
    assert body is not None

    # Transitive taint: variables descending from any ppermute output.
    tainted = set()
    n_pallas = n_pallas_tainted = 0
    for eqn in body.eqns:
        in_tainted = any(
            isinstance(v, jcore.Var) and v in tainted for v in eqn.invars
        )
        if eqn.primitive.name == "ppermute" or in_tainted:
            tainted.update(eqn.outvars)
        if eqn.primitive.name == "pallas_call":
            n_pallas += 1
            n_pallas_tainted += bool(in_tainted)

    # One pass runs 5 region kernels: interior + 4 bands.
    assert n_pallas == 5, f"expected 5 region kernels (one pass), saw {n_pallas}"
    assert n_pallas_tainted == 4, (
        f"{n_pallas_tainted}/5 kernels depend on ppermutes — exactly the "
        "4 band kernels may; the interior kernel must stay "
        "exchange-independent for overlap to exist"
    )


def _collect_ppermutes(jx):
    """All (axis_name, perm) pairs of every ppermute in a jaxpr, recursing
    into sub-jaxprs (shard_map / pjit / scan bodies)."""
    from jax._src import core as jcore

    out = []

    def subjaxprs(params):
        for v in params.values():
            items = v if isinstance(v, (list, tuple)) else (v,)
            for s in items:
                if isinstance(s, jcore.ClosedJaxpr):
                    yield s.jaxpr
                elif isinstance(s, jcore.Jaxpr):
                    yield s

    def walk(j):
        for eqn in j.eqns:
            if eqn.primitive.name == "ppermute":
                axes = eqn.params.get("axis_name")
                ax = axes[0] if isinstance(axes, (tuple, list)) else axes
                out.append((ax, tuple(eqn.params["perm"])))
            for s in subjaxprs(eqn.params):
                walk(s)

    walk(jx)
    return out


def _is_truncated(perm, n):
    """True for an edge-truncated shift (n-1 uniform-delta pairs); a cyclic
    shift has n pairs including the wrap pair.  Pair-value inspection is
    ambiguous on n=2 (the +1 wrap pair (1,0) looks like a -1 shift pair),
    so classify by length + uniform unit delta."""
    deltas = {d - s for s, d in perm}
    return len(perm) == n - 1 and deltas in ({1}, {-1})


@pytest.mark.parametrize("path", ["slab", "overlap", "perstep"])
def test_no_wrap_traffic_on_nonperiodic_axes(path):
    """MPI_PROC_NULL-skip analogue (reference: src/halo.cpp:28-43): axes
    whose BCs are all non-periodic must use EDGE-TRUNCATED ppermute lists —
    no 0<->p-1 wrap pair, whose payload edge shards would immediately
    overwrite with BC ghosts.  Structural check on the jaxpr; behavior is
    covered by the sharded numerics tests."""
    from climate_sim_tpu.parallel.halo import (
        build_sharded_advance,
        build_sharded_multistep_advance,
        build_sharded_overlap_advance,
    )
    from climate_sim_tpu.ops.step import make_interior_step

    cfg = SimConfig(nx=1024, ny=512, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                    steps=8, out_every=8)
    cfg.bc = BCConfig(BCType.DIRICHLET, BCType.NEUMANN,
                      BCType.DIRICHLET, BCType.NEUMANN)
    mesh = make_mesh(4, 2)
    if path == "slab":
        adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    elif path == "overlap":
        adv = build_sharded_overlap_advance(cfg, mesh, cfg.dt, interpret=True)
    else:
        adv = build_sharded_advance(
            cfg, mesh, cfg.dt, make_interior_step(cfg, cfg.dt)
        )
    assert adv is not None
    u = jax.device_put(
        jnp.asarray(gaussian_ic(cfg.nx, cfg.ny), jnp.float32),
        field_sharding(mesh),
    )
    perms = _collect_ppermutes(jax.make_jaxpr(adv(8))(u).jaxpr)
    assert perms, "expected halo-exchange ppermutes in the chunk program"
    sizes = {"x": 4, "y": 2}
    for ax, perm in perms:
        assert _is_truncated(perm, sizes[ax]), (
            f"non-periodic axis {ax!r} ships wrap traffic: {perm}"
        )


def test_wrap_traffic_kept_on_periodic_axes():
    """The converse: a torus x axis keeps its wrap pair (that payload IS
    the periodic neighbor), while the non-periodic y axis truncates."""
    from climate_sim_tpu.parallel.halo import build_sharded_multistep_advance

    cfg = SimConfig(nx=1024, ny=512, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                    steps=8, out_every=8)
    cfg.bc = BCConfig(BCType.PERIODIC, BCType.PERIODIC,
                      BCType.DIRICHLET, BCType.NEUMANN)
    mesh = make_mesh(4, 2)
    adv = build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None
    u = jax.device_put(
        jnp.asarray(gaussian_ic(cfg.nx, cfg.ny), jnp.float32),
        field_sharding(mesh),
    )
    perms = _collect_ppermutes(jax.make_jaxpr(adv(8))(u).jaxpr)
    x_perms = [p for ax, p in perms if ax == "x"]
    y_perms = [p for ax, p in perms if ax == "y"]
    assert x_perms and y_perms
    assert all(len(p) == 4 for p in x_perms), (
        f"periodic x axis lost its wrap payload: {x_perms}"
    )
    assert all(_is_truncated(p, 2) for p in y_perms), (
        f"non-periodic y axis ships wrap traffic: {y_perms}"
    )


def test_dcn_granule_count_synthetic():
    """Granule convention over synthetic device sets: slices when the
    platform exposes slice_index, else processes (TPU only); CPU/virtual
    sets have no DCN topology."""
    from climate_sim_tpu.parallel.mesh import dcn_granule_count

    class Dev:
        def __init__(self, platform="tpu", process_index=0, slice_index=None):
            self.platform = platform
            self.process_index = process_index
            if slice_index is not None:
                self.slice_index = slice_index

    assert dcn_granule_count([Dev(slice_index=0), Dev(slice_index=0)]) == 1
    assert dcn_granule_count(
        [Dev(slice_index=0), Dev(slice_index=1), Dev(slice_index=1)]
    ) == 2
    assert dcn_granule_count([Dev(process_index=0), Dev(process_index=1)]) == 2
    assert dcn_granule_count([Dev() for _ in range(4)]) == 1
    assert dcn_granule_count([Dev(platform="cpu", process_index=i) for i in range(4)]) == 1
    assert dcn_granule_count(jax.devices()) == 1
    assert dcn_granule_count([]) == 1


def test_structural_exchange_depth_per_pass():
    """Pin the exchange-serialization slope STRUCTURALLY (the r03 latency
    injection could only bracket it in [2, 4] — the host callback runtime
    serializes the two directions of a round that real links run
    concurrently).  The jaxpr critical-path count is exact: 2 rounds per
    pass (x faces, then y slabs built from the x-extended rows — the same
    chain as the reference's columns-then-full-rows exchange,
    halo.cpp:28-46) on every production path — INCLUDING the staged
    carrier torus since r05 (the wrap-head staging ppermutes ride the
    exchange rounds instead of preceding them; r04 measured 4 here)."""
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.ops.step import make_interior_step
    from climate_sim_tpu.parallel import halo as H
    from climate_sim_tpu.parallel.analysis import ppermute_critical_depth
    from jax.sharding import NamedSharding

    cfg = SimConfig(nx=1024, ny=512, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                    steps=8, out_every=8)
    cfg.bc = BCConfig(BCType.DIRICHLET, BCType.NEUMANN,
                      BCType.DIRICHLET, BCType.NEUMANN)
    mesh = make_mesh(4, 2)
    u = jax.device_put(gaussian_hotspot(cfg, jnp.float32), field_sharding(mesh))

    slab = H.build_sharded_multistep_advance(cfg, mesh, cfg.dt, interpret=True)
    assert ppermute_critical_depth(slab(8), u) == 2
    ovl = H.build_sharded_overlap_advance(cfg, mesh, cfg.dt, interpret=True)
    assert ppermute_critical_depth(ovl(8), u) == 2
    ps = H.build_sharded_advance(cfg, mesh, cfg.dt,
                                 make_interior_step(cfg, cfg.dt))
    assert ppermute_critical_depth(ps(1), u) == 2  # per step == per pass

    torus = SimConfig(nx=1024, ny=512, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                      steps=8, out_every=8)
    torus.bc = BCConfig(*(BCType.PERIODIC,) * 4)
    slab_t = H.build_sharded_multistep_advance(torus, mesh, torus.dt,
                                               interpret=True)
    assert ppermute_critical_depth(slab_t(8), u) == 2

    # Carrier: 2 rounds plain AND with periodic pad staging (the x
    # wrap-head ppermute rides round 1, the y wrap-head rides round 2 —
    # never upstream of the slab exchange).
    icfg = SimConfig(nx=1000, ny=504, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                     steps=8, out_every=8)
    car = H.build_carrier_slab_advance(icfg, mesh, icfg.dt, interpret=True)
    assert car is not None
    rep = NamedSharding(mesh, PartitionSpec(None, None))
    uc = car.embed(jax.device_put(gaussian_hotspot(icfg, jnp.float32), rep))
    assert ppermute_critical_depth(car(8), uc) == 2
    icfg_t = SimConfig(nx=1000, ny=504, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                       steps=8, out_every=8)
    icfg_t.bc = BCConfig(*(BCType.PERIODIC,) * 4)
    car_t = H.build_carrier_slab_advance(icfg_t, mesh, icfg_t.dt,
                                         interpret=True)
    assert car_t is not None
    uct = car_t.embed(
        jax.device_put(gaussian_hotspot(icfg_t, jnp.float32), rep)
    )
    assert ppermute_critical_depth(car_t(8), uct) == 2


@pytest.mark.parametrize("name,bcs,mesh_shape", [
    # All six one-sided orientations, both mesh orientations, plus
    # self-wrap meshes where the periodic axis has a single shard.
    ("os_y_bottom", ("dirichlet", "neumann", "periodic", "dirichlet"), (2, 2)),
    ("os_y_top", ("neumann", "dirichlet", "dirichlet", "periodic"), (2, 4)),
    ("os_x_left", ("periodic", "dirichlet", "neumann", "dirichlet"), (4, 2)),
    ("os_x_right", ("neumann", "periodic", "dirichlet", "neumann"), (2, 2)),
    ("both_axes", ("periodic", "dirichlet", "periodic", "neumann"), (2, 2)),
    ("both_axes_2", ("dirichlet", "periodic", "neumann", "periodic"), (2, 2)),
    ("os_y_selfwrap", ("dirichlet", "neumann", "periodic", "dirichlet"), (8, 1)),
    ("os_x_selfwrap", ("periodic", "dirichlet", "neumann", "dirichlet"), (1, 8)),
])
def test_overlap_one_sided_periodic_fuses_full_k(name, bcs, mesh_shape):
    """The overlap path fuses one-sided-periodic configs at full k: the
    face exchanges deliver the wrap blocks into the band inputs
    (sublane-rounded halo depth) and the band kernels' flag-gated wrap
    consumer patches pin the far BC at each block's outer line every
    sub-step.  19 steps = two full k=8 passes plus a kk=3 remainder, so
    the rounded remainder geometry is exercised too; mass is parked
    against both wrap seams.  (Reference: the nonblocking-overlap path
    works for every BC mix, halo.cpp:28-46 + boundary.cpp:12-54.)"""
    from oracle import run_oracle

    from climate_sim_tpu.parallel.halo import build_sharded_overlap_advance

    px, py = mesh_shape
    cfg = SimConfig(nx=1024, ny=256, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                    steps=19, out_every=19)
    cfg.bc = BCConfig(*(getattr(BCType, b.upper()) for b in bcs))
    mesh = make_mesh(px, py)
    adv = build_sharded_overlap_advance(cfg, mesh, cfg.dt, interpret=True)
    assert adv is not None, "overlap build must not decline this geometry"
    u0 = np.asarray(gaussian_ic(cfg.nx, cfg.ny), np.float32)
    u0 = (u0 + 0.5 * np.roll(u0, cfg.ny // 2 - 2, 0)
          + 0.5 * np.roll(u0, cfg.nx // 2 - 2, 1))
    ref = run_oracle(u0.astype(np.float64), 19, cfg.D, cfg.vx, cfg.vy,
                     cfg.dt, bc=bcs)
    u = jax.device_put(jnp.asarray(u0, jnp.float32), field_sharding(mesh))
    out = np.asarray(adv(19)(u))
    np.testing.assert_allclose(out, ref, rtol=0, atol=5e-5)


def test_overlap_one_sided_slope_stays_two():
    """The fused one-sided overlap pass keeps the structural 2-round
    exchange slope (x slabs, then y slabs built from the x-ghosted tile)
    — the wrap consumer patches add no collectives."""
    from climate_sim_tpu.ops.init import gaussian_hotspot
    from climate_sim_tpu.parallel.analysis import ppermute_critical_depth
    from climate_sim_tpu.parallel.halo import build_sharded_overlap_advance

    mesh = make_mesh(4, 2)
    for bcs in (("dirichlet", "neumann", "periodic", "dirichlet"),
                ("periodic", "dirichlet", "periodic", "neumann")):
        cfg = SimConfig(nx=1024, ny=512, D=0.05, vx=0.5, vy=-0.25, dt=0.1,
                        steps=8, out_every=8)
        cfg.bc = BCConfig(*(getattr(BCType, b.upper()) for b in bcs))
        adv = build_sharded_overlap_advance(cfg, mesh, cfg.dt, interpret=True)
        assert adv is not None
        u = jax.device_put(
            gaussian_hotspot(cfg, jnp.float32), field_sharding(mesh)
        )
        assert ppermute_critical_depth(adv(8), u) == 2
