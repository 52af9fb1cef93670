"""Pallas TPU kernels for the fused diffusion+advection stencil.

The reference's hot loop (reference: src/main.cpp:101-109) is one fused
forward-Euler update per step: ``u' = u + dt*D*lap(u) - dt*(v . grad_upwind u)``
(diffusion.cpp:3-16 + advection.cpp:5-33).  That update moves 8 bytes/point/step
(one f32 read + one f32 write; neighbors hit on-chip) — purely HBM-bandwidth
bound on TPU when stepped one step at a time.

The performance design is a **multi-step kernel**: advance ``k`` consecutive
Euler steps entirely in VMEM, reading each point from HBM once per ``k``
steps — up to ``k``x the single-step HBM roofline.  Each row-block loads
``BY + 2k`` rows and per sub-step:

1. re-applies physical-edge BCs in-kernel (Dirichlet fill / Neumann mirror /
   reference-compat stale-zero) at the ghost line adjacent to the physical
   boundary — the moral equivalent of ``apply_boundary`` (boundary.cpp:12-54)
   running every step;
2. updates the shrinking-validity interior with the fused stencil collapsed
   to a 5-point weighted stencil (the update is linear with config-constant
   coefficients): validity shrinks one row/col per sub-step from
   non-physical buffer edges (the classic overlapped-halo trapezoid), so
   after ``k`` sub-steps the central ``BY x nx`` region is exact.

Periodic sides need true wrap data in the pads; the influence diamond
|dy|+|dx| <= k is covered by k-wide pads with exact (diagonal-including)
wrap.  Two input paths provide them:

* **fused-DMA mode** (fast path; needs ``nx % 128 == 0``, ``k % 8 == 0``):
  the kernel reads the raw ``(ny, nx)`` field straight from HBM with
  wrap-aware segmented DMAs — 3 row segments (up/main/down, starts computed
  mod ny) plus, for periodic x, 128-wide wrap strips into a 128-column pad
  region on each side (TPU DMA slices must be 128-aligned in the minor
  dimension, so the x pad is 128 wide even though only k columns are used).
  No host/XLA-level assembly pass at all.

* **assembled mode** (general path): an XLA-level ``assemble_padded`` builds
  a ``(ny+2k, round_up(nx+2k,128))`` array (wrap or zero pads); the kernel
  DMAs overlapping row windows from it.  Costs one extra HBM round trip per
  pass; used for odd shapes/k and for the pre-padded single-step kernel.

Row-block input windows overlap by ``2k`` rows, which BlockSpec index maps
cannot express, so the input stays in HBM (``memory_space=ANY``) and each
block DMAs its window into a double-buffered VMEM scratch (the next block's
loads overlap this block's compute).  Output blocks are disjoint and use the
normal pipelined BlockSpec.

Numerics match :func:`climate_sim_tpu.ops.stencil.fused_step` up to f32
re-association (the weighted-stencil form; tested to tight tolerances).
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import BCConfig, BCType, SimConfig

# VMEM budget for choosing block heights: one (R, W) input window.  Total
# VMEM use is ~4.5x this (double-buffered input + ping-pong buffer + pipelined
# output blocks) plus per-sub-step vector temporaries; the pallas_call raises
# vmem_limit_bytes accordingly.  Swept on v5e at 4096^2: 3 MB (BY=128) beats
# 2 MB (BY=64, more halo redundancy) and 5 MB (BY=256, worse locality).
_VMEM_BUDGET_BYTES = 3 * 1024 * 1024

_XPAD = 128  # x pad width in fused-DMA mode (minor-dim DMA alignment unit)
# MXU-hybrid sub-step matmul precision (CLIMATE_SIM_MXU_PRECISION knob;
# the By entries are O(1) and each output is a 3-term combination, so even
# the cheapest pass keeps ~bf16-product accuracy per term).
_MXU_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.HIGH,
    "highest": jax.lax.Precision.HIGHEST,
}[os.environ.get("CLIMATE_SIM_MXU_PRECISION", "highest").lower()]

# Preferred x-block width (fused-DMA mode).  Narrower blocks measured faster
# than monolithic rows on v5e (better VMEM locality): 4096-wide rows ran at
# ~98 Gpt/s vs ~119 Gpt/s for 2048-wide blocks at the same redundancy.
_PREF_BX = 2048


def _pick_block_rows(
    n_rows: int, row_bytes: int, halo: int, sub: int = 8
) -> Optional[int]:
    """Largest divisor BY of ``n_rows`` with (BY + 2*halo) * row_bytes within
    budget, preferring BY in [64, 512] and multiples of the sublane tile
    ``sub`` (8 for f32, 16 for bf16).  None if nothing fits."""
    divisors = [d for d in range(1, n_rows + 1) if n_rows % d == 0]
    fits = [d for d in divisors if (d + 2 * halo) * row_bytes <= _VMEM_BUDGET_BYTES]
    if not fits:
        return None
    for pool in (
        [d for d in fits if 64 <= d <= 512 and d % sub == 0],
        [d for d in fits if d % sub == 0],
        fits,
    ):
        if pool:
            return max(pool)
    return None


def _stencil_weights(dt, D, vx, vy, dx, dy):
    """The unsplit Euler update collapsed to a 5-point weighted stencil:
    u' = wc*c + wxm*xm + wxp*xp + wym*ym + wyp*yp (upwind signs resolved
    statically).  Single source of truth for the kernel and the ghost-row
    schedule evolutions."""
    ax = dt * D / (dx * dx)
    ay = dt * D / (dy * dy)
    cx = dt * vx / dx
    cy = dt * vy / dy
    wc = 1.0 - 2.0 * ax - 2.0 * ay - abs(cx) - abs(cy)
    wxm = ax + (cx if vx >= 0.0 else 0.0)
    wxp = ax + (-cx if vx < 0.0 else 0.0)
    wym = ay + (cy if vy >= 0.0 else 0.0)
    wyp = ay + (-cy if vy < 0.0 else 0.0)
    return wc, wxm, wxp, wym, wyp


def _bc_ghost_line(kind: str, mirror, value: float = 0.0):
    """Ghost-line value for a physical side: Dirichlet fill / compat zero /
    Neumann mirror.  ``mirror`` is the adjacent interior line."""
    if kind == "dirichlet":
        return jnp.full_like(mirror, value)
    if kind == "zero":
        return jnp.zeros_like(mirror)
    return mirror  # neumann


def _fixup_side(bc: BCType, compat: bool) -> Optional[str]:
    """What the per-sub-step in-kernel BC fixup must do for a physical side.

    None means "leave the pad alone": true-periodic pads carry wrap data that
    evolves correctly for k sub-steps (trapezoid argument).
    """
    if bc == BCType.DIRICHLET:
        return "dirichlet"
    if bc == BCType.NEUMANN:
        return "neumann"
    # periodic
    if compat:
        # Reference periodic is a silent no-op: ghosts keep their initial
        # fill(0.0) forever (boundary.cpp has no Periodic branch) — i.e.
        # numerically Dirichlet(0) re-applied each step.
        return "zero"
    return None


def _build_kernel_body(
    *,
    k: int,
    khalo: int,
    R: int,
    Rbuf: int,
    W: int,
    BY: int,
    BX: int,
    nx: int,
    nxg: int,
    ny: int,
    xoff: int,
    nbx: int,
    nby: int,
    n_blocks: int,
    fused_dma: bool,
    wrap_x: bool,
    dt: float,
    D: float,
    vx: float,
    vy: float,
    dx: float,
    dy: float,
    bc_value: float,
    fix_left: Optional[str],
    fix_right: Optional[str],
    fix_bottom: Optional[str],
    fix_top: Optional[str],
    prepadded: bool,
    sharded: bool,
    slab_mode: bool,
    compute_dtype,
    fullslab: bool = False,
    mxu: bool = False,
    chained: bool = False,
    carrier: bool = False,
    slab_padless: bool = False,
    sub: int = 8,
):
    """The kernel function (closure over all static parameters).

    ``sharded=True`` adds a leading (4,) int32 SMEM input of physical-edge
    flags (left, right, bottom, top): inside shard_map every shard runs the
    same program, so whether a side is a physical boundary (the
    ``MPI_PROC_NULL`` analogue, boundary.cpp:17-20) is runtime data — fixups
    then blend the BC ghost line with the neighbor-halo data by flag.

    Buffer layout: interior columns live at [xoff, xoff+nx); ghost-line
    fixup columns at xoff-1 and xoff+nx.  Scratch: ``a_scratch`` (2, R, W)
    double-buffered input windows, ``sems`` (2, n_dma) DMA semaphores.
    """
    # The unsplit Euler update is LINEAR in u with config-constant
    # coefficients, so fold diffusion + upwind advection into one 5-point
    # weighted stencil (5 FMAs/point on the VPU vs ~17 ops for the naive
    # form — the kernel is VPU-bound once the multi-step scheme has
    # amortized HBM traffic).  Upwind signs (advection.cpp:16-27) are
    # resolved at trace time.
    wc, wxm, wxp, wym, wyp = _stencil_weights(dt, D, vx, vy, dx, dy)

    # X-side fixups in the FULL-SLAB form run as lane-masked selects on
    # the already-computed neighbor rolls instead of ghost-lane writes:
    # reading a (Rbuf,) column out of the tile forces a sublane<->lane
    # relayout that measured ~6% of TOTAL kernel time per Neumann x side
    # (the mirror needs the column read; Dirichlet pays only the store,
    # ~1%).  With the select, the Neumann "mirror" is the lane's own
    # value — no cross-lane motion at all.  Row fixups are lane-layout
    # friendly and stay as writes in the store form.
    sel_left = fullslab and fix_left is not None
    sel_right = fullslab and fix_right is not None
    # Chained (value-chained) sub-steps: drop the ping-pong ref store —
    # one full-buffer copy of the ~10-12 vector ops per sub-step — by
    # threading each sub-step's result to the next as a VALUE.  That
    # forbids ref-write fixups entirely, so the y-side fixups move onto
    # sublane-masked selects on the y-rolls (the row sibling of the
    # sel_left/sel_right lane trick): the Neumann "mirror" seen through
    # the roll is the row's OWN value, Dirichlet/compat are splats.  Net
    # op count per sub-step: -1 (the store) +1 per y side needing a
    # fixup — measured a win for every class (docs/performance.md).
    sel_bottom = chained and fix_bottom is not None
    sel_top = chained and fix_top is not None

    def make_loads(refs, a_scratch, sems, block, slot):
        """(condition, async_copy) pairs filling window ``block`` into
        scratch slot ``slot``; condition None = unconditional, else the copy
        starts (and is waited) only under that predicate."""
        dst = a_scratch.at[slot]
        if not (fused_dma or slab_mode):
            # Rbuf = R rounded up to the 8-row sublane tile (DMA slice
            # alignment); the extra rows are input padding, never computed.
            # The row start needs an explicit divisibility hint: Mosaic
            # cannot prove block*BY % 8 == 0 through the pid rem/div chain
            # (hardware lowering fails on small-region kernels without it).
            (hbm_ref,) = refs
            if nby == 1 and nbx == 1:
                start = 0  # single block: keep the slice start static
            else:
                start = jnp.asarray(block, jnp.int32) * jnp.int32(BY)
                if BY % sub == 0:
                    start = pl.multiple_of(start, sub)
            return [(
                None,
                pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(start, Rbuf), :], dst, sems.at[slot, 0]
                ),
            )]
        # Index math stays int32: under jax_enable_x64 a Python-int operand
        # would emit an i64 convert, which Mosaic cannot lower.
        block = jnp.asarray(block, jnp.int32)  # literal 0 is i64 under x64
        by = jax.lax.rem(block, jnp.int32(nby))
        bx = block // jnp.int32(nby)
        base = by * jnp.int32(BY)
        cmain = pl.multiple_of(bx * jnp.int32(BX), 128)

        if slab_padless:
            # PADLESS sharded-tile fast path: full-width blocks, buffer
            # lanes [0, BX) from row segments of the tile (plus, at the
            # first/last row-block, the compact y-slab rows, sliced at the
            # slab's 128-aligned _XPAD offset) and lanes [BX, BX+128) from
            # ONE unconditional copy of the packed x ghost strip (its rows
            # line up with the buffer window: strip row p = tile row
            # p - khalo, including the y extensions).
            tile_ref, yhalo_ref, xs_ref = refs
            upt = pl.multiple_of(jnp.maximum(base - jnp.int32(khalo), 0), sub)
            dnt = pl.multiple_of(
                jnp.minimum(base + jnp.int32(BY), jnp.int32(ny - khalo)), sub
            )
            first_y, last_y = by == 0, by == nby - 1
            out = []
            i = 0

            def rowseg(dst_r, n, ycond, yrow0, trow0):
                nonlocal i
                if ycond is not None:
                    out.append((ycond, pltpu.make_async_copy(
                        yhalo_ref.at[pl.ds(yrow0, n), pl.ds(_XPAD, BX)],
                        dst.at[pl.ds(dst_r, n), pl.ds(0, BX)],
                        sems.at[slot, i],
                    )))
                    i += 1
                    tcond = jnp.logical_not(ycond)
                else:
                    tcond = None
                out.append((tcond, pltpu.make_async_copy(
                    tile_ref.at[pl.ds(trow0, n), :],
                    dst.at[pl.ds(dst_r, n), pl.ds(0, BX)],
                    sems.at[slot, i],
                )))
                i += 1

            rowseg(0, khalo, first_y, 0, upt)
            rowseg(khalo, BY, None, None, pl.multiple_of(base, sub))
            rowseg(khalo + BY, khalo, last_y, khalo, dnt)
            out.append((None, pltpu.make_async_copy(
                xs_ref.at[pl.ds(pl.multiple_of(base, sub), Rbuf), :],
                dst.at[:, pl.ds(BX, 128)],
                sems.at[slot, i],
            )))
            return out

        if slab_mode:
            # Sharded-tile fast path: the shard's (my, mx) tile plus compact
            # exchanged halo slabs (xhalo (my, 256): left|right 128-wide pad
            # blocks; yhalo (2*khalo, mx+256): bottom|top padded rows).  Row
            # segments and x strips choose their source ref by block
            # position; every size is static, clamped starts keep even the
            # not-taken descriptors in bounds.
            tile_ref, xhalo_ref, yhalo_ref = refs
            upt = pl.multiple_of(jnp.maximum(base - jnp.int32(khalo), 0), sub)
            dnt = pl.multiple_of(
                jnp.minimum(base + jnp.int32(BY), jnp.int32(ny - khalo)), sub
            )
            clt = pl.multiple_of(jnp.maximum(cmain - jnp.int32(_XPAD), 0), 128)
            crt = pl.multiple_of(
                jnp.minimum(cmain + jnp.int32(BX), jnp.int32(nxg - _XPAD)), 128
            )
            first_y, last_y = by == 0, by == nby - 1
            first_x, last_x = bx == 0, bx == nbx - 1
            out = []
            i = 0

            def seg(dst_r, n, ycond, yrow0, trow0):
                """One row segment: full-width from yhalo at the y edge,
                else tile main + per-side strips (xhalo at x edges)."""
                nonlocal i
                if ycond is not None:
                    out.append((ycond, pltpu.make_async_copy(
                        yhalo_ref.at[pl.ds(yrow0, n), pl.ds(cmain, W)],
                        dst.at[pl.ds(dst_r, n), :],
                        sems.at[slot, i],
                    )))
                    i += 1
                    tcond = jnp.logical_not(ycond)
                else:
                    tcond = None
                out.append((tcond, pltpu.make_async_copy(
                    tile_ref.at[pl.ds(trow0, n), pl.ds(cmain, BX)],
                    dst.at[pl.ds(dst_r, n), pl.ds(xoff, BX)],
                    sems.at[slot, i],
                )))
                i += 1
                for side_cond, halo_c0, tile_c0, dst_c0 in (
                    (first_x, 0, clt, 0),
                    (last_x, _XPAD, crt, xoff + BX),
                ):
                    edge = side_cond if tcond is None else jnp.logical_and(tcond, side_cond)
                    inner = (
                        jnp.logical_not(side_cond)
                        if tcond is None
                        else jnp.logical_and(tcond, jnp.logical_not(side_cond))
                    )
                    out.append((edge, pltpu.make_async_copy(
                        xhalo_ref.at[pl.ds(trow0, n), pl.ds(halo_c0, _XPAD)],
                        dst.at[pl.ds(dst_r, n), pl.ds(dst_c0, _XPAD)],
                        sems.at[slot, i],
                    )))
                    out.append((inner, pltpu.make_async_copy(
                        tile_ref.at[pl.ds(trow0, n), pl.ds(tile_c0, _XPAD)],
                        dst.at[pl.ds(dst_r, n), pl.ds(dst_c0, _XPAD)],
                        sems.at[slot, i + 1],
                    )))
                    i += 2

            seg(0, khalo, first_y, 0, upt)
            seg(khalo, BY, None, None, pl.multiple_of(base, sub))
            seg(khalo + BY, khalo, last_y, khalo, dnt)
            return out

        # Fused-DMA single-device mode: wrap-aware segmented loads from the
        # raw (ny, nxg) field.  Buffer row r holds global row
        # (by*BY - khalo + r) mod ny and interior cols [bx*BX, bx*BX+BX);
        # three contiguous row segments (khalo above / BY main / khalo
        # below); x ghosts come as 128-wide strips from the neighboring
        # column ranges mod nxg (only the innermost k columns are consumed;
        # 128 keeps every minor-dim DMA slice aligned).  All starts are
        # multiples of 8/128 (BY, khalo, ny, BX, nxg all are) — tell Mosaic.
        (hbm_ref,) = refs
        ny32 = jnp.int32(ny)
        nxg32 = jnp.int32(nxg)
        up0 = pl.multiple_of(jax.lax.rem(base - jnp.int32(khalo) + ny32, ny32), sub)
        dn0 = pl.multiple_of(jax.lax.rem(base + jnp.int32(BY), ny32), sub)
        main0 = pl.multiple_of(base, sub)
        cleft = pl.multiple_of(
            jax.lax.rem(cmain - jnp.int32(_XPAD) + nxg32, nxg32), 128
        )
        cright = pl.multiple_of(jax.lax.rem(cmain + jnp.int32(BX), nxg32), 128)
        segs = [(0, up0, khalo), (khalo, main0, BY), (khalo + BY, dn0, khalo)]
        # Padless full-width wrap-x (xoff == 0) needs no strips: the
        # circular lane roll supplies the periodic neighbor directly.
        strips = nbx > 1 or (wrap_x and xoff > 0)
        copies = []
        i = 0
        for dst_r, src_r, n in segs:
            copies.append((None, pltpu.make_async_copy(
                hbm_ref.at[pl.ds(src_r, n), pl.ds(cmain, BX)],
                dst.at[pl.ds(dst_r, n), pl.ds(xoff, BX)],
                sems.at[slot, i],
            )))
            i += 1
            if strips:
                copies.append((None, pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(src_r, n), pl.ds(cleft, _XPAD)],
                    dst.at[pl.ds(dst_r, n), pl.ds(0, _XPAD)],
                    sems.at[slot, i],
                )))
                copies.append((None, pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(src_r, n), pl.ds(cright, _XPAD)],
                    dst.at[pl.ds(dst_r, n), pl.ds(xoff + BX, _XPAD)],
                    sems.at[slot, i + 1],
                )))
                i += 2
        return copies

    if slab_padless:
        # Three row segments (edge segments conditionally sourced from the
        # compact y slab or the tile) + one unconditional strip copy.
        n_dma = 6
    elif slab_mode:
        n_dma = 17
    elif fused_dma:
        n_dma = 9 if (nbx > 1 or (wrap_x and xoff > 0)) else 3
    else:
        n_dma = 1

    def _bc_line(kind, n, mirror):
        del n  # shape comes from the mirror line
        return _bc_ghost_line(kind, mirror, bc_value)

    def apply_fixups(src, bx, by, flags):
        """Re-apply physical-edge BCs at the ghost lines, writing into the
        ``src`` ref in place (the ``apply_boundary`` analogue, every step).
        Each side fires only on blocks at that edge of the (bx, by) grid
        AND, when ``flags`` (a (4,) int32 SMEM ref of physical-edge flags
        [left, right, bottom, top], sharded mode) is present, only on
        shards whose tile side is a physical boundary — interior blocks/
        shards keep their neighbor-halo data.  (Store-form only; the
        chained form's fixups all ride masked selects.)"""
        if fix_left is not None and not sel_left:
            col = _bc_line(fix_left, Rbuf, src[:, xoff])
            cond = (bx == 0) if nbx > 1 else True
            if flags is not None:
                cond = jnp.logical_and(cond, flags[0] != 0)
            if cond is not True:
                col = jnp.where(cond, col, src[:, xoff - 1])
            src[:, xoff - 1] = col
        if fix_right is not None and not sel_right:
            col = _bc_line(fix_right, Rbuf, src[:, xoff + nx - 1])
            cond = (bx == nbx - 1) if nbx > 1 else True
            if flags is not None:
                cond = jnp.logical_and(cond, flags[1] != 0)
            if cond is not True:
                col = jnp.where(cond, col, src[:, xoff + nx])
            src[:, xoff + nx] = col
        # y sides: only the first/last row-blocks touch a physical y edge.
        if fix_bottom is not None:
            row = _bc_line(fix_bottom, W, src[khalo, :])
            cond = by == 0
            if flags is not None:
                cond = jnp.logical_and(cond, flags[2] != 0)
            src[khalo - 1, :] = jnp.where(cond, row, src[khalo - 1, :])
        if fix_top is not None:
            # Physical top edge sits at buffer row R-khalo for the LAST
            # row-block.
            row = _bc_line(fix_top, W, src[R - khalo - 1, :])
            cond = by == nby - 1
            if flags is not None:
                cond = jnp.logical_and(cond, flags[3] != 0)
            src[R - khalo, :] = jnp.where(cond, row, src[R - khalo, :])

    def _run_loads(loads, action):
        for cond, c in loads:
            if cond is None:
                getattr(c, action)()
            else:
                @pl.when(cond)
                def _(c=c):
                    getattr(c, action)()

    def kernel(*refs):
        if slab_padless:
            flags_ref, tile_ref, yh_ref, xs_ref, out_ref, a_scratch, b_scratch, sems = refs
            in_refs = (tile_ref, yh_ref, xs_ref)
        elif slab_mode:
            flags_ref, tile_ref, xh_ref, yh_ref, out_ref, a_scratch, b_scratch, sems = refs
            in_refs = (tile_ref, xh_ref, yh_ref)
        elif sharded:
            flags_ref, hbm_ref, out_ref, a_scratch, b_scratch, sems = refs
            in_refs = (hbm_ref,)
        else:
            hbm_ref, out_ref, a_scratch, b_scratch, sems = refs
            flags_ref = None
            in_refs = (hbm_ref,)
        pid = pl.program_id(0)
        slot = jax.lax.rem(pid, jnp.int32(2))
        by = jax.lax.rem(pid, jnp.int32(nby))
        bx = pid // jnp.int32(nby)

        # Double-buffered input: block 0's loads start at program 0; each
        # program prefetches the next block's window before computing.
        @pl.when(pid == 0)
        def _():
            _run_loads(make_loads(in_refs, a_scratch, sems, 0, 0), "start")

        @pl.when(pid + 1 < n_blocks)
        def _():
            nxt = jax.lax.rem(pid + jnp.int32(1), jnp.int32(2))
            _run_loads(make_loads(in_refs, a_scratch, sems, pid + 1, nxt), "start")

        _run_loads(make_loads(in_refs, a_scratch, sems, pid, slot), "wait")

        # k sub-steps, statically unrolled, ping-ponging between the DMA'd
        # window (ref view) and a second scratch buffer: stencil reads src,
        # writes dst on the shrinking-validity row range [1+t, R-1-t) (the
        # trapezoid; physical-edge ghost lines are re-supplied by fixups,
        # never computed).
        # Per sub-step: compute the shrinking-validity trapezoid rows
        # [1+t, R-1-t) over the FULL buffer width.  Full-width reads keep
        # every load lane-aligned (the +-1 neighbor shifts lower to cheap
        # lane rotates); trimming to the exact needed column range was
        # measured slower because it makes every read misaligned.
        view = a_scratch.at[slot]
        bufs = [view, b_scratch]
        # Lane-masked select fixups (see sel_left/sel_right above): the
        # mask marks the interior edge lane whose rolled x-neighbor must
        # be replaced by the ghost value, gated on block position and
        # (sharded) the physical-edge flags.  Traced once; the unrolled
        # sub-steps reuse it.
        sel_mask_l = sel_mask_r = None

        def _gate(m, edge_cond, flag_idx):
            cond = edge_cond
            if flags_ref is not None:
                f = flags_ref[flag_idx] != 0
                cond = f if cond is None else jnp.logical_and(cond, f)
            return m if cond is None else jnp.logical_and(m, cond)

        if sel_left or sel_right:
            lane = jax.lax.broadcasted_iota(jnp.int32, (Rbuf, W), 1)

            def _sel_mask(lane_idx, edge_cond, flag_idx):
                return _gate(lane == jnp.int32(lane_idx), edge_cond, flag_idx)

            if sel_left:
                if slab_padless:
                    # Physical-edge shards patch their border consumer
                    # with the BC (flag-gated); interior/torus shards take
                    # the strip ghost edge straight through the roll wrap
                    # — no select fires for them at all.
                    sel_mask_l = _sel_mask(0, None, 0)
                else:
                    sel_mask_l = _sel_mask(
                        xoff, (bx == 0) if nbx > 1 else None, 0
                    )
            if sel_right:
                if slab_padless and not carrier:
                    sel_mask_r = _sel_mask(BX - 1, None, 1)
                elif carrier:
                    # Carrier mode (padded indivisible grid): the true
                    # right edge sits at a runtime TILE column, flags[5]
                    # (the ghost column; only meaningful on shards whose
                    # flags[1] marks them as holding the edge).  lcol =
                    # global tile column of each buffer lane; patching
                    # fires at every consumer of the ghost column across
                    # block-halo overlaps — which is exactly what keeps
                    # the pad-lane creep evolution correct too.
                    lcol = lane - jnp.int32(xoff) + bx * jnp.int32(BX)
                    sel_mask_r = _gate(lcol == flags_ref[5] - 1, None, 1)
                else:
                    sel_mask_r = _sel_mask(
                        xoff + nx - 1, (bx == nbx - 1) if nbx > 1 else None, 1
                    )
        # Row (y-side) fixup masks for the chained form: the ghost row at
        # khalo-1 is consumed only by the ym roll at output row khalo, the
        # one at R-khalo only by the yp roll at output row R-khalo-1 —
        # patch exactly those sublanes of the rolled operands, gated on
        # block position and (sharded) the physical-edge flags, like the
        # lane masks.  Built once; the unrolled sub-steps reuse them.
        row_mask_b = row_mask_t = None
        if sel_bottom or sel_top:
            subl = jax.lax.broadcasted_iota(jnp.int32, (Rbuf, W), 0)
            if sel_bottom:
                row_mask_b = _gate(
                    subl == jnp.int32(khalo), (by == 0) if nby > 1 else None, 2
                )
            if sel_top:
                if carrier:
                    # True top edge at runtime tile row flags[4] (the ghost
                    # row); trow = global tile row of each buffer sublane.
                    trow = subl - jnp.int32(khalo) + by * jnp.int32(BY)
                    row_mask_t = _gate(trow == flags_ref[4] - 1, None, 3)
                else:
                    row_mask_t = _gate(
                        subl == jnp.int32(R - khalo - 1),
                        (by == nby - 1) if nby > 1 else None, 3,
                    )

        def sel_val(kind, a):
            # Ghost value seen through the select: the Neumann mirror is
            # the edge lane's OWN value (zero data motion); Dirichlet /
            # compat-zero are constants.
            if kind == "neumann":
                return a
            return compute_dtype.type(bc_value if kind == "dirichlet" else 0.0)

        def sel_val_y(kind, a):
            # Row sibling of sel_val: the ghost row seen through the y-roll
            # select.  Neumann mirror = the row's own value (ym brings
            # a[khalo-1] to row khalo, whose mirror is a[khalo] — the same
            # row of ``a``).
            if kind == "neumann":
                return a
            return compute_dtype.type(bc_value if kind == "dirichlet" else 0.0)

        # ONE-SIDED-periodic wrap-block consumer patches (every chained
        # layout): a one-sided axis's wrap ghost data (true data from the
        # opposite edge — delivered by the mod-extent fused-DMA segments,
        # the exchanged slabs, or the carrier's staging) evolves in-buffer
        # as if the axis were a torus — but the opposite edge is a
        # physical BC side, so the wrap block's OUTERMOST line must see
        # that BC, not the wrapped neighbor.  Exactly one roll operand is
        # affected per axis: e.g. bottom=periodic ⇒ the block holds global
        # rows [ny-kh, ny) below the tile, and row ny-1's yp consumer
        # (sublane khalo-1) must read bc(top) instead of global row 0.
        # The select-value trick makes every BC kind free (Neumann mirror
        # = the lane's own value).  This is the whole one-sided mechanism
        # — it replaced the r02-r03 external ghost-row/column schedules,
        # which computed the same values outside the kernel at ~10x the
        # code and measurable per-pass cost.  EXCEPTION: padless fused x
        # (xoff == 0) needs no x patch at all — the main array itself
        # wraps through the roll, and the fixed side's ordinary fixup
        # select is the barrier.  (Reference semantics: boundary.cpp:12-54
        # applies BCs orthogonal to decomposition, decomp.cpp:29-30.)
        wrap_yp_mask = wrap_ym_mask = wrap_xp_mask = wrap_xm_mask = None
        if chained:
            ii = jax.lax.broadcasted_iota
            x_self_wrapped = fused_dma and xoff == 0 and not slab_mode
            if fix_bottom is None and fix_top is not None and wyp != 0.0:
                s = ii(jnp.int32, (Rbuf, W), 0)
                wrap_yp_mask = _gate(
                    s == jnp.int32(khalo - 1),
                    (by == 0) if nby > 1 else None, 2,
                )
            if fix_top is None and fix_bottom is not None and wym != 0.0:
                s = ii(jnp.int32, (Rbuf, W), 0)
                if carrier:
                    # true edge at a runtime tile row (flags[4])
                    trow2 = s - jnp.int32(khalo) + by * jnp.int32(BY)
                    wrap_ym_mask = _gate(trow2 == flags_ref[4], None, 3)
                else:
                    # wrap block = the top halo rows of the last row-block
                    wrap_ym_mask = _gate(
                        s == jnp.int32(R - khalo),
                        (by == nby - 1) if nby > 1 else None, 3,
                    )
            if fix_left is None and fix_right is not None and wxp != 0.0 \
                    and not x_self_wrapped:
                ll = ii(jnp.int32, (Rbuf, W), 1)
                # The left wrap data's outer line: last lane of the left
                # ghost strip (padless slab: the roll-wrap strip's tail
                # lane; strip/assembled: the pad column left of the tile).
                wrap_lane = W - 1 if slab_padless else xoff - 1
                wrap_xp_mask = _gate(
                    ll == jnp.int32(wrap_lane),
                    (bx == 0) if nbx > 1 else None, 0,
                )
            if fix_right is None and fix_left is not None and wxm != 0.0 \
                    and not x_self_wrapped:
                ll = ii(jnp.int32, (Rbuf, W), 1)
                if carrier:
                    # true edge at a runtime tile column (flags[5])
                    lcol2 = ll - jnp.int32(xoff) + bx * jnp.int32(BX)
                    wrap_xm_mask = _gate(lcol2 == flags_ref[5], None, 1)
                else:
                    # wrap block = the right ghost strip's first lane
                    wrap_lane = BX if slab_padless else xoff + nx
                    wrap_xm_mask = _gate(
                        ll == jnp.int32(wrap_lane),
                        (bx == nbx - 1) if nbx > 1 else None, 1,
                    )

        if chained:
            # Value-chained sub-steps: identical math to the full-slab
            # store form (same rolls, same staleness-creep invariant), but
            # each sub-step's result feeds the next as a value — no
            # ping-pong ref store — and ALL four sides' fixups ride
            # masked selects on the rolled operands.  In padless slab mode
            # the strip lanes [BX, BX+128) evolve with the SAME rolls (the
            # zero gaps absorb cross-boundary creep within budget), so the
            # ghost edge lanes hold the neighbor's edge evolved t steps.
            # bf16 builds compute the chain in f32 (bf16-STORAGE mode):
            # HBM/VMEM traffic at 2 bytes/point, ONE bf16 rounding per
            # k-step pass instead of ~10 per sub-step — the VPU runs f32
            # either way, so this costs only the two casts.
            a = view[:, :]
            if compute_dtype == jnp.dtype(jnp.bfloat16):
                a = a.astype(jnp.float32)
            for t in range(k):
                new = wc * a
                if wym != 0.0:
                    ym_v = pltpu.roll(a, 1, 0)
                    if row_mask_b is not None:
                        ym_v = jnp.where(
                            row_mask_b, sel_val_y(fix_bottom, a), ym_v
                        )
                    if wrap_ym_mask is not None:
                        ym_v = jnp.where(
                            wrap_ym_mask, sel_val_y(fix_bottom, a), ym_v
                        )
                    new += wym * ym_v
                if wyp != 0.0:
                    yp_v = pltpu.roll(a, R - 1, 0)
                    if row_mask_t is not None:
                        yp_v = jnp.where(
                            row_mask_t, sel_val_y(fix_top, a), yp_v
                        )
                    if wrap_yp_mask is not None:
                        yp_v = jnp.where(
                            wrap_yp_mask, sel_val_y(fix_top, a), yp_v
                        )
                    new += wyp * yp_v
                if wxm != 0.0:
                    xm_v = pltpu.roll(a, 1, 1)
                    if sel_mask_l is not None:
                        xm_v = jnp.where(sel_mask_l, sel_val(fix_left, a), xm_v)
                    if wrap_xm_mask is not None:
                        xm_v = jnp.where(
                            wrap_xm_mask, sel_val(fix_left, a), xm_v
                        )
                    new += wxm * xm_v
                if wxp != 0.0:
                    xp_v = pltpu.roll(a, W - 1, 1)
                    if sel_mask_r is not None:
                        xp_v = jnp.where(sel_mask_r, sel_val(fix_right, a), xp_v)
                    if wrap_xp_mask is not None:
                        xp_v = jnp.where(
                            wrap_xp_mask, sel_val(fix_right, a), xp_v
                        )
                    new += wxp * xp_v
                a = new
            out_ref[:, :] = a[khalo : khalo + BY, xoff : xoff + BX].astype(
                compute_dtype
            )
            return

        if mxu:
            # Circulant-tridiagonal y-combination matrix: (By @ a)[r, w] =
            # wym*a[r-1 mod R, w] + wc*a[r, w] + wyp*a[r+1 mod R, w] —
            # exactly the wc/wym/wyp roll terms of the full-slab form,
            # moved onto the MXU.  Built from iota (traced once; the
            # unrolled sub-steps reuse it).
            ri = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
            dm = jax.lax.rem(ri - ci + jnp.int32(R), jnp.int32(R))
            zero = jnp.zeros((R, R), compute_dtype)
            By = jnp.where(dm == 0, compute_dtype.type(wc), zero)
            if wym != 0.0:
                By = By + jnp.where(dm == 1, compute_dtype.type(wym), zero)
            if wyp != 0.0:
                By = By + jnp.where(dm == R - 1, compute_dtype.type(wyp), zero)
        for t in range(k):
            src = bufs[t % 2]
            dst = bufs[(t + 1) % 2]
            if not prepadded:
                apply_fixups(src, bx, by, flags_ref)
            if fullslab:
                # Full-slab form: compute ALL (Rbuf, W) points every
                # sub-step with circular rolls for the four neighbor
                # shifts.  Every load and store is tile-aligned with a
                # static shape (no shrinking ranges, no lane/sublane-offset
                # stores), at the price of ~(2k/BY) redundant row-compute.
                # Staleness creeps inward one ring per sub-step from the
                # slab border (rows 0/R-1 and the roll-wrapped columns are
                # never valid), which is exactly the trapezoid invariant —
                # after k sub-steps the output rows [khalo, khalo+BY) and
                # interior columns are untouched by it.
                a = src[:, :]
                if mxu:
                    # y-combination (incl. the wc*a center term) on the MXU.
                    new = jnp.dot(By, a, preferred_element_type=compute_dtype,
                                  precision=_MXU_PRECISION)
                else:
                    new = wc * a
                    # pltpu.roll requires non-negative shifts: -1 == size-1.
                    if wym != 0.0:
                        new += wym * pltpu.roll(a, 1, 0)
                    if wyp != 0.0:
                        new += wyp * pltpu.roll(a, R - 1, 0)
                if wxm != 0.0:
                    xm_v = pltpu.roll(a, 1, 1)
                    if sel_mask_l is not None:
                        xm_v = jnp.where(sel_mask_l, sel_val(fix_left, a), xm_v)
                    new += wxm * xm_v
                if wxp != 0.0:
                    xp_v = pltpu.roll(a, W - 1, 1)
                    if sel_mask_r is not None:
                        xp_v = jnp.where(sel_mask_r, sel_val(fix_right, a), xp_v)
                    new += wxp * xp_v
                dst[:, :] = new
            else:
                lo, hi = 1 + t, R - 1 - t
                a = src[pl.ds(lo - 1, hi - lo + 2), :]
                new = wc * a[1:-1, 1:-1]
                if wxm != 0.0:
                    new += wxm * a[1:-1, :-2]
                if wxp != 0.0:
                    new += wxp * a[1:-1, 2:]
                if wym != 0.0:
                    new += wym * a[:-2, 1:-1]
                if wyp != 0.0:
                    new += wyp * a[2:, 1:-1]
                dst[pl.ds(lo, hi - lo), pl.ds(1, W - 2)] = new
        final = bufs[k % 2]
        out_ref[:, :] = final[khalo : khalo + BY, xoff : xoff + BX]

    return kernel, n_dma


def _build_multistep_call(*args, **kwargs):
    """Cache shim: the x64 flag participates in hardware-lowering viability
    below, so it must be part of the build-cache key — otherwise toggling
    jax_enable_x64 between builds could serve a stale probe result.  The
    CLIMATE_SIM_BX / CLIMATE_SIM_BY env knobs (perf-sweep tooling, see
    docs/performance.md) enter the key the same way."""
    env = os.environ
    return _build_multistep_call_cached(
        *args, **kwargs,
        x64=bool(jax.config.read("jax_enable_x64")),
        bx_override=int(env.get("CLIMATE_SIM_BX", 0)) or None,
        by_override=int(env.get("CLIMATE_SIM_BY", 0)) or None,
        substep_override=_substep_override(env.get("CLIMATE_SIM_SUBSTEP")),
    )


def _substep_override(raw: Optional[str]) -> Optional[str]:
    if not raw:
        return None
    if raw not in ("trapezoid", "fullslab", "mxu", "chain"):
        raise ValueError(
            f"CLIMATE_SIM_SUBSTEP={raw!r}: must be 'trapezoid', 'fullslab',"
            " 'mxu' or 'chain'"
        )
    return raw


_MAX_CHAIN_W = 5120  # lanes; wider VMEM windows measured slower (locality)

# Carrier block-height band: the carrier's wider row stride shifts the BY
# locality optimum below the aligned case's max-under-256 pick (measured,
# docs/performance.md "CARRIER BY BAND").  Single source of truth for the
# in-kernel BY override AND parallel/halo's BY-friendliness height
# expansion — retuning one without the other would desynchronize them.
_CARRIER_BY_BAND = (120, 176)


def carrier_band_divisor(
    m: int, sub: int, width_lanes: int, itemsize: int, khalo: int
):
    """Largest ``sub``-multiple divisor of ``m`` inside the carrier BY
    band whose (d + 2*khalo, width_lanes) VMEM window also respects the
    chain scorer's 10 MB cap, or None."""
    lo, hi = _CARRIER_BY_BAND
    return max(
        (d for d in range(-(-lo // sub) * sub, hi + 1, sub)
         if m % d == 0
         and (d + 2 * khalo) * width_lanes * itemsize <= 10 * 1024 * 1024),
        default=None,
    )


def _chain_geometry(
    nx: int,
    ny: int,
    khalo: int,
    itemsize: int,
    padless_ok: bool,
    bx_default: int,
    sub: int = 8,
) -> Optional[tuple]:
    """Pick (BX, BY) for a value-chained build.

    Candidates (the narrow-block default, BX=4096 when it divides, full
    width) are scored by modeled redundant compute, Rbuf/BY * W/BX, with
    the VMEM window capped at 10 MB and BY at 256 (BY=512 measured slower
    — locality).  Buffer WIDTH is capped at ``_MAX_CHAIN_W`` lanes when
    any narrower candidate divides the grid: wide windows lose to VMEM
    locality effects the waste model cannot see.  Measured on v5e
    (device Gpt/s, full-width vs best half-width): 4096² 229.6 vs 212.7
    and 5120² 231.6 vs 215.7 — full width WINS under the knee — then
    6144² 196.1 vs 216.6, 7168² 201.6 vs 219.0, 8192² 204.6 vs 220.9,
    16384² 188.8 vs 211.0 — full width loses past it, so the knee sits
    between W=5120 and W=6144.  Returns None to keep the caller's
    defaults.
    """
    cands = {bx_default, nx}
    # The largest 128-multiple divisor whose buffer fits under the width
    # cap — the intermediate candidate non-full-width grids need (e.g.
    # 4096 at nx=8192/16384, 3072 at nx=6144); min-waste then prefers it
    # over narrower blocks automatically (pad overhead shrinks with bxc).
    mid = max(
        (d for d in range(128, min(nx, _MAX_CHAIN_W - 2 * _XPAD) + 1, 128)
         if nx % d == 0),
        default=None,
    )
    if mid is not None:
        cands.add(mid)
    scored = []
    for bxc in sorted(cands):
        if nx % bxc or bxc % 128:
            continue
        wc = bxc if (padless_ok and bxc == nx) else bxc + 2 * _XPAD
        byc = max(
            (d for d in range(sub, min(ny, 256) + 1, sub)
             if ny % d == 0
             and (d + 2 * khalo) * wc * itemsize <= 10 * 1024 * 1024),
            default=None,
        )
        if byc is None:
            continue
        waste = (byc + 2 * khalo) / byc * (wc / bxc)
        scored.append((waste, bxc, byc, wc))
    if not scored:
        return None
    narrow = [s for s in scored if s[3] <= _MAX_CHAIN_W]
    waste, bx, by, _ = min(narrow or scored)
    return bx, by


@functools.lru_cache(maxsize=64)
def _build_multistep_call_cached(
    ny: int,
    nx: int,
    k: int,
    khalo: int,
    dt: float,
    D: float,
    vx: float,
    vy: float,
    dx: float,
    dy: float,
    bc_value: float,
    fix_left: Optional[str],
    fix_right: Optional[str],
    fix_bottom: Optional[str],
    fix_top: Optional[str],
    wrap_x: bool,
    fused_dma: bool,
    prepadded: bool,
    sharded: bool,
    slab_mode: bool,
    dtype_name: str,
    interpret: bool,
    x64: bool,
    bx_override: Optional[int] = None,
    by_override: Optional[int] = None,
    substep_override: Optional[str] = None,
    carrier: bool = False,
    slab_padless: bool = False,
):
    """pallas_call advancing k steps -> (ny, nx).

    fused_dma: input is the raw (ny, nx) field.  Otherwise the input is the
    assembled ``(ny+2k, round_up(nx+2k,128))`` padded array (alignment
    columns are garbage that sits exactly outside the validity trapezoid).
    """
    compute_dtype = jnp.dtype(dtype_name)
    # Sublane tile height: 8 rows for 4-byte dtypes, 16 for bf16 — every
    # hardware DMA row start/size and block height must respect it.
    sub = 16 if compute_dtype == jnp.dtype(jnp.bfloat16) else 8
    if khalo < k:
        return None
    # Mosaic supports f32 and (with 16-sublane tiles) bf16 vector
    # arithmetic; f64 is unlowerable on TPU — it takes the jnp/XLA
    # fallback when compiling for hardware (interpret mode keeps it for
    # CPU parity tests).  jax_enable_x64 also disqualifies hardware
    # lowering: index normalization then emits i64 ref indices, which
    # Mosaic rejects.  The flag is part of the lru_cache key (shim above),
    # so toggling x64 between builds re-probes instead of serving stale
    # results.  This guard checks the CALLER's requested mode, before any
    # backend-driven interpret upgrade below: interpret=False means
    # "hardware semantics" on every backend, so an f64/x64 run falls back
    # to XLA identically on CPU tests and real TPUs.
    if not interpret and (
        compute_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.bfloat16))
        or x64
    ):
        return None
    if not interpret:
        # Mosaic lowers only on TPU; an explicitly-requested Pallas kernel
        # on any other backend runs in interpret mode (correct, slow) rather
        # than crashing at trace time with a raw pallas ValueError — the
        # CPU-parity mode every test uses (found by the driver-level fuzz).
        try:
            on_tpu = jax.devices()[0].platform == "tpu"
        except Exception:
            on_tpu = False
        if not on_tpu:
            interpret = True
    # Will the build end up value-chained (see below)?  Needed early: the
    # chained form has its own measured-best block geometry.
    chain_intent = substep_override in (None, "chain")
    # PADLESS-X eligibility: with full-width blocks the 2*_XPAD
    # ghost-strip lanes can be dropped entirely (buffer = exactly
    # (Rbuf, nx)) for EVERY x BC combination:
    #  - a physical x side (fix set) is a lane-masked select barrier: the
    #    circular lane roll wraps garbage across that edge and the select
    #    patches it out at the consumer lane — the staleness-barrier
    #    argument of the pads;
    #  - a live-periodic x side (fix None) needs nothing at all: the
    #    circular roll's wrap IS the periodic neighbor — column 0's left
    #    neighbor is column nx-1 by definition.  (For a ONE-sided x axis
    #    the fixed side's select is simultaneously the barrier that stops
    #    the wrap from acting as a torus — no extra patch needed in this
    #    layout.)
    # The strips were 2*128/4096 = 6.25% redundant lanes at the headline
    # width that every vector op computed.
    padless_ok = (
        fused_dma
        and not slab_mode
        and substep_override in (None, "fullslab", "chain")
    )
    by_forced = None
    if slab_padless:
        # PADLESS slab mode: full-width blocks whose buffer is exactly
        # (Rbuf, mx + 128) — the last lane tile holds the packed x ghost
        # strips (slab_x_strip_pair), which EVOLVE WITH the main array
        # (the rolls give ghost columns their true inner neighbors; zero
        # gaps absorb cut creep), and the main border lanes are patched by
        # masked selects from the strip's evolved ghost edge lanes — the
        # padless-x trick applied to neighbor data.  Requires the chained
        # select form; the width-knee cap (_MAX_CHAIN_W) gates
        # eligibility — past it the strip-pad layout with narrower blocks
        # wins, caller falls back.
        if not slab_mode or substep_override not in (None, "chain"):
            return None
        if nx % 128 or ny % sub or khalo % sub:
            return None
        # Both ghost blocks must fit one lane tile; the cut-to-edge creep
        # budget (khalo >= k) is guaranteed by the khalo < k guard above.
        if 2 * khalo > 128:
            return None
        best = _chain_geometry(
            nx, ny, khalo, compute_dtype.itemsize, True, nx, sub
        )
        if best is None or best[0] != nx:
            return None
        BX = nx
        W = nx + 128  # main lanes + the packed ghost-strip lane tile
        xoff = 0
        BY = best[1]
        if carrier:
            # Carrier buffers are wider than the aligned slab's (the pad
            # columns ride inside nx here), which shifts the BY locality
            # optimum DOWN from the scorer's max-under-256 pick.  Measured
            # (v5e, mixed BCs, 6000-step protocol): 4000² BY=160 180.9
            # vs BY=200 174.3 (+3.7%, reproduced across three sessions);
            # 3000² BY=120 162.2 vs 159.9 (+1.6%); 5000² has no divisor
            # in the band and keeps the scorer's 200 (182, unaffected).
            # Prefer the largest sublane-multiple divisor in [120, 176]
            # that still respects _chain_geometry's 10 MB VMEM-window cap
            # (on very wide single-shard carriers the scorer's
            # budget-constrained BY can sit BELOW the band — overriding
            # it upward would blow the budget and risk a Mosaic
            # VMEM/compile failure instead of a clean fallback).
            cand = carrier_band_divisor(
                ny, sub, W, compute_dtype.itemsize, khalo
            )
            if cand is not None:
                BY = cand
        if by_override and ny % by_override == 0 and by_override % sub == 0:
            BY = by_override
        R = BY + 2 * khalo
        Rbuf = R
        nbx = 1
        nby = ny // BY
        n_blocks = nby
    elif fused_dma or slab_mode:
        xoff = _XPAD
        # 2D block grid: x-blocks of BX columns (largest 128-multiple
        # divisor of nx up to _PREF_BX), each with 128-wide ghost strips.
        # Tiny x-blocks drown in DMA overhead (a 3968-wide grid's best
        # 128-multiple divisor is 128 -> half speed measured), so fall back
        # to full width when no divisor >= 512 exists.
        BX = max(
            (d for d in range(128, min(nx, _PREF_BX) + 1, 128) if nx % d == 0),
            default=None,
        )
        if BX is None:
            return None
        if BX < 512 and nx > BX:
            BX = nx
        if (
            chain_intent and fused_dma and not slab_mode
            and not bx_override and not by_override
        ):
            best = _chain_geometry(
                nx, ny, khalo, compute_dtype.itemsize, padless_ok, BX, sub
            )
            if best is not None:
                BX, by_forced = best
        if bx_override and nx % bx_override == 0 and bx_override % 128 == 0:
            BX = bx_override
        W = BX + 2 * _XPAD
        padless_x = padless_ok and BX == nx
        if padless_x:
            xoff = 0
            W = nx
    else:
        BX = nx
        W = -(-(nx + 2 * khalo) // 128) * 128
        xoff = khalo
    if not slab_padless:
        row_bytes = W * compute_dtype.itemsize
        BY = by_forced if by_forced is not None else _pick_block_rows(
            ny, row_bytes, khalo, sub
        )
        if by_override and ny % by_override == 0 and by_override % sub == 0:
            BY = by_override
        if BY is None:
            return None
        if (fused_dma or slab_mode) and (
            BY % sub or khalo % sub or nx % 128 or ny % sub
        ):
            return None
        if not interpret and not (fused_dma or slab_mode) and BY % sub and ny // BY > 1:
            # Assembled-mode hardware DMA slices rows at block*BY, which
            # must sit on the 8-row sublane tile; a misaligned BY only
            # lowers in interpret mode.  (nby == 1 starts at 0 and is
            # always aligned.)
            return None
        R = BY + 2 * khalo
        Rbuf = R if (fused_dma or slab_mode) else -(-R // sub) * sub
        nbx = nx // BX
        nby = ny // BY
        n_blocks = nbx * nby

    # Full-slab sub-steps (aligned rolls instead of shrinking-trapezoid
    # slices) are the default where the scratch window is exactly the
    # logical window (Rbuf == R): measured +1-2.5% on hardware (single and
    # sharded slab paths) — the aligned form's per-op win slightly
    # outweighs its ~2k/BY redundant border rows.  Opt out with
    # CLIMATE_SIM_SUBSTEP=trapezoid (perf-sweep A/B knob).
    fullslab = substep_override != "trapezoid" and Rbuf == R and not prepadded
    # Experimental MXU-hybrid sub-step (opt-in, CLIMATE_SIM_SUBSTEP=mxu):
    # the y-direction tridiagonal combination runs as an (R, R) circulant
    # matmul on the MXU, leaving only the two x lane-rolls + FMAs on the
    # VPU — trades VPU issue slots (the measured bound) for MXU work that
    # can overlap.  Requires the full-slab form and active y physics.
    mxu = substep_override == "mxu" and fullslab and not (vy == 0.0 and D == 0.0)
    # Value-chained sub-steps (see _build_kernel_body): the default for
    # every full-slab build.  The original op-count model (store −1,
    # each y-side write-fixup-turned-select +1 ⇒ gate at <= 1 fixup y
    # side) undercounted the ping-pong store's real cost and predated
    # padless-x (which needs the select form): measured on v5e at 4096²,
    # chain wins every 2-y-fixup class too — all-dirichlet 204.5→229.2,
    # one-sided-y 201.4→227.5, both-axes 168.7→190.5 device Gpt/s, slab
    # dirichlet 179.4→186.0 Gpt/s/shard (docs/performance.md).
    # CLIMATE_SIM_SUBSTEP=fullslab forces the store form (A/B knob).
    if carrier:
        # Carrier (padded-indivisible) builds REQUIRE the chained select
        # form: the true top/right edges sit at runtime tile positions the
        # store form's static-row fixup writes cannot express.
        if not fullslab or mxu:
            return None
        chained = True
    elif substep_override in ("fullslab", "mxu", "trapezoid"):
        chained = False
    else:  # None or "chain" (mxu is impossible here: its override is
        # consumed by the elif above)
        chained = fullslab
    os_x = (fix_left is None) != (fix_right is None)
    os_y = (fix_bottom is None) != (fix_top is None)
    if (os_x or os_y) and k > 1 and not chained:
        # One-sided semantics at k > 1 need the wrap-block consumer
        # patches, which ride the chained form's roll selects; the
        # store/trapezoid A/B forms decline (callers fall back to k=1
        # passes, whose wrap data is consumed before any evolution).
        # Exception below: padless fused x needs no patch, but y might.
        return None
    if compute_dtype == jnp.dtype(jnp.bfloat16) and not chained:
        # bf16-STORAGE numerics (f32 arithmetic, one rounding per pass)
        # exist only in the chained form; the store/trapezoid forms would
        # silently compute bf16 arithmetic — decline in interpret mode
        # too (CPU parity must match hardware), callers fall back to the
        # (also storage-semantics) fused_step_storage jnp step.
        return None

    kernel, n_dma = _build_kernel_body(
        k=k, khalo=khalo, R=R, Rbuf=Rbuf, W=W, BY=BY, BX=BX, nx=BX, nxg=nx,
        ny=ny, xoff=xoff, nbx=nbx, nby=nby, n_blocks=n_blocks,
        fused_dma=fused_dma, wrap_x=wrap_x,
        dt=dt, D=D, vx=vx, vy=vy, dx=dx, dy=dy, bc_value=bc_value,
        fix_left=fix_left, fix_right=fix_right,
        fix_bottom=fix_bottom, fix_top=fix_top,
        prepadded=prepadded, sharded=sharded, slab_mode=slab_mode,
        compute_dtype=compute_dtype, fullslab=fullslab, mxu=mxu,
        chained=chained, carrier=carrier, slab_padless=slab_padless,
        sub=sub,
    )

    in_rows = ny if (fused_dma or slab_mode) else ny + 2 * khalo + (Rbuf - R)
    bytes_accessed = n_blocks * Rbuf * W * compute_dtype.itemsize
    bytes_accessed += ny * nx * compute_dtype.itemsize
    flops = 9 * ny * nx * k  # 5-pt weighted stencil per sub-step

    n_any = 3 if slab_mode else 1  # slab: tile+xhalo+yhalo / tile+yhalo+xstrip
    in_specs = [pl.BlockSpec(memory_space=pl.ANY)] * n_any
    if sharded:
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
    call = pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (BY, BX), lambda b: (b % nby, b // nby), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((ny, nx), compute_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, Rbuf, W), compute_dtype),
            pltpu.VMEM((Rbuf, W), compute_dtype),
            pltpu.SemaphoreType.DMA((2, n_dma)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )
    if fused_dma or slab_mode:
        return call

    def padded_call(*args):
        # Pad the assembled/pre-padded input to the exact shape the kernel
        # DMAs: need_cols for the 128-lane slices, need_rows for the 8-row
        # window alignment.  Pad values are never computed or read.
        x = args[-1]
        pr = in_rows - x.shape[0]
        pc = W - x.shape[1]
        if pr or pc:
            x = jnp.pad(x, ((0, pr), (0, pc)))
        return call(*args[:-1], x)

    return padded_call


def assemble_padded(u: jnp.ndarray, bc: BCConfig, k: int, compat: bool) -> jnp.ndarray:
    """Interior (ny, nx) -> (ny+2k, round_up(nx+2k, 128)) kernel input.

    Periodic (non-compat) sides get true wrap data — assembled x-first so the
    y-wrap rows carry wrapped x pads, making diagonal (corner) wrap exact.
    Non-periodic sides get zeros; their values are irrelevant because the
    kernel re-applies the BC at the adjacent ghost line every sub-step.
    Extra right-hand alignment columns (for 128-aligned DMA rows) are zeros.
    """
    ny, nx = u.shape
    W = -(-(nx + 2 * k) // 128) * 128
    z_col = jnp.zeros((ny, k), u.dtype)
    lp = u[:, -k:] if (bc.left == BCType.PERIODIC and not compat) else z_col
    rp = u[:, :k] if (bc.right == BCType.PERIODIC and not compat) else z_col
    parts = [lp, u, rp]
    if W > nx + 2 * k:
        parts.append(jnp.zeros((ny, W - nx - 2 * k), u.dtype))
    m = jnp.concatenate(parts, axis=1)
    z_row = jnp.zeros((k, W), u.dtype)
    bp = m[-k:] if (bc.bottom == BCType.PERIODIC and not compat) else z_row
    tp = m[:k] if (bc.top == BCType.PERIODIC and not compat) else z_row
    return jnp.concatenate([bp, m, tp], axis=0)


def _fixes_and_sides(cfg: SimConfig, k: int):
    """The kernel-build BC parameters for a config at pass size k:
    (fixes 4-list, wrap_x).

    One-sided-periodic sides are live-periodic (fix None): the layouts
    deliver true wrap data for them (circular roll wrap in padless
    full-width x; mod-extent segments / exchanged slabs elsewhere) and
    the CHAINED kernel re-pins the opposite side's BC at the wrap data's
    outer line every sub-step (the ``wrap_*_mask`` consumer patches) — so
    the wrap block evolves with the one-sided semantics instead of as a
    torus.  This replaced the r02-r03 ghost-SCHEDULE machinery (opposite
    edge strips evolved outside the kernel), which computed the same
    values at higher cost and complexity.  ``wrap_x`` requests wrap data
    in the x pads whenever any x side is live-periodic."""
    compat = cfg.strict_reference_compat
    fixes = [
        _fixup_side(cfg.bc.left, compat), _fixup_side(cfg.bc.right, compat),
        _fixup_side(cfg.bc.bottom, compat), _fixup_side(cfg.bc.top, compat),
    ]
    wrap_x = not compat and (
        cfg.bc.left == BCType.PERIODIC or cfg.bc.right == BCType.PERIODIC
    )
    return fixes, wrap_x


def multistep_kernel_step(
    u: jnp.ndarray,
    cfg: SimConfig,
    dt: float,
    k: int,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Advance the global interior field ``k`` steps with one kernel pass.

    Exactly equivalent to ``k`` iterations of pad_with_ghosts + fused_step
    (up to f32 re-association).  Returns None if no kernel layout fits
    (caller falls back to jnp).
    """
    def stepwise():
        # k single-step passes: each pass rebuilds the wrap ghosts from
        # the just-updated opposite edge (the oracle's semantics).
        out = u
        for _ in range(k):
            nxt = multistep_kernel_step(out, cfg, dt, 1, interpret)
            if nxt is None:
                return None
            out = nxt
        return out

    ny, nx = u.shape
    compat = cfg.strict_reference_compat
    # One-sided-periodic sides are live wrap data handled in-kernel: the
    # padless full-width layout wraps x through the circular roll itself,
    # the mod-extent DMA segments / assembled pads carry the y (and
    # strip-mode x) wrap copies, and the chained form's wrap_*_mask
    # consumer patches pin the opposite side's BC at each wrap block's
    # outer line every sub-step — no precomputed schedules.
    fixes, wrap_x = _fixes_and_sides(cfg, k)
    rest = (
        float(dt), float(cfg.D), float(cfg.vx), float(cfg.vy),
        float(cfg.dx), float(cfg.dy), 0.0, *fixes, wrap_x,
    )
    # fused-DMA halo: k rounded up to the dtype's sublane tile (8 f32 /
    # 16 bf16 — row-segment DMA starts must sit on it).
    sub = 16 if jnp.dtype(u.dtype) == jnp.dtype(jnp.bfloat16) else 8
    khalo8 = -(-k // sub) * sub
    call = _build_multistep_call(
        ny, nx, k, khalo8, *rest, True, False, False, False,
        jnp.dtype(u.dtype).name, interpret,
    )
    if call is not None:
        return call(u)
    call = _build_multistep_call(
        ny, nx, k, k, *rest, False, False, False, False,
        jnp.dtype(u.dtype).name, interpret,
    )
    if call is not None:
        return call(assemble_padded(u, cfg.bc, k, compat))
    if k > 1 and one_sided_periodic(cfg):
        # One-sided at k > 1 needs the chained wrap patches; layouts that
        # decline (e.g. a sublane-misaligned assembled window) fall back
        # to exact single-step passes, whose wrap ghosts are consumed
        # before any in-buffer evolution.
        return stepwise()
    return None


def prepadded_kernel_step(
    up: jnp.ndarray,
    cfg: SimConfig,
    dt: float,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Single step on a ghost-padded (my+2, mx+2) tile -> (my, mx) interior.

    The ghost ring must already hold valid values (BCs/halo applied); this is
    the per-shard interior kernel for the shard_map path.
    """
    my, mx = up.shape[0] - 2, up.shape[1] - 2
    call = _build_multistep_call(
        my, mx, 1, 1, float(dt), float(cfg.D), float(cfg.vx), float(cfg.vy),
        float(cfg.dx), float(cfg.dy), 0.0,
        None, None, None, None, False,
        False, True, False, False, jnp.dtype(up.dtype).name, interpret,
    )
    if call is None:
        return None
    return call(up)


def sharded_tile_multistep(
    padded: jnp.ndarray,
    edge_flags: jnp.ndarray,
    cfg: SimConfig,
    dt: float,
    k: int,
    mx: int,
    interpret: bool = False,
) -> Optional[jnp.ndarray]:
    """Advance one shard's full tile k steps inside shard_map.

    ``padded``: (my+2k, mx+2k) tile with k-wide halos already exchanged
    (wrap/neighbor faces; garbage beyond physical edges is fine — in-kernel
    fixups re-supply BC ghosts every sub-step, gated on ``edge_flags``:
    (4,) int32 = [left, right, bottom, top] physical-edge indicators derived
    from ``lax.axis_index`` — the MPI_PROC_NULL analogue, boundary.cpp:17-20).
    Returns the updated (my, mx) interior, or None if no layout fits.
    """
    my = padded.shape[0] - 2 * k
    return tile_region_multistep(
        padded, edge_flags, cfg, dt, k, my, mx, True, interpret
    )


def tile_region_multistep(
    padded,
    edge_flags,
    cfg: SimConfig,
    dt: float,
    k: int,
    ny_r: int,
    nx_r: int,
    flagged: bool,
    interpret: bool = False,
    probe: bool = False,
    probe_dtype: str = "float32",
    khalo: int = 0,
):
    """Advance one REGION of a shard's tile k steps (the overlapped-halo
    pass building block, see parallel/halo.py::build_sharded_overlap_advance).

    ``padded``: (ny_r + 2*khalo, >= nx_r + 2*khalo) input whose pads hold
    tile/halo data (``khalo`` defaults to k).  ``flagged=True`` applies the
    config BC fixups gated on ``edge_flags`` (4,) int32; ``flagged=False``
    applies no fixups at all — the pure shrinking-trapezoid interior case.
    ``probe=True`` just reports layout availability (returns the call or
    None; shapes are static).

    One-sided-periodic configs fuse at full k when the build takes the
    chained form (the wrap-block consumer patches ride its roll selects —
    the overlap caller rounds khalo/band geometry to the 8-row sublane
    tile to guarantee that); otherwise the builder declines and the
    caller falls back.
    """
    compat = cfg.strict_reference_compat
    if flagged:
        fixes = (
            _fixup_side(cfg.bc.left, compat), _fixup_side(cfg.bc.right, compat),
            _fixup_side(cfg.bc.bottom, compat), _fixup_side(cfg.bc.top, compat),
        )
    else:
        fixes = (None, None, None, None)
    dtype_name = probe_dtype if probe else jnp.dtype(padded.dtype).name
    call = _build_multistep_call(
        ny_r, nx_r, k, khalo or k, float(dt), float(cfg.D), float(cfg.vx),
        float(cfg.vy),
        float(cfg.dx), float(cfg.dy), 0.0, *fixes,
        False, False, False, flagged, False, dtype_name, interpret,
    )
    if probe or call is None:
        return call
    if flagged:
        return call(edge_flags.astype(jnp.int32), padded)
    return call(padded)


def slab_x_strip_pair(
    tile: jnp.ndarray,
    xhalo: jnp.ndarray,
    yhalo: jnp.ndarray,
    khalo: int,
) -> jnp.ndarray:
    """The (my + 2*khalo, 128) x-GHOST-STRIP input of the PADLESS slab
    kernel layout (``slab_padless``): both sides' exchanged ghost blocks,
    y-extended by the y slabs (whose x pads carry diagonal-neighbor
    data), packed into one lane tile POSITIONED SO THE CIRCULAR LANE
    ROLLS DELIVER THEM — appended as buffer lanes [BX, BX+128):

    * lanes [0, khalo) (buffer [BX, BX+khalo)): RIGHT ghost block in
      increasing-x order — its edge column sits at buffer lane BX, which
      the xp roll wraps to the main right border lane BX-1;
    * lanes [128-khalo, 128) (buffer [W-khalo, W)): LEFT ghost block,
      edge column at buffer lane W-1, which the xm roll wraps to main
      lane 0;
    * zeros between.

    The wrap adjacency is exact in BOTH directions: the main border lanes
    read the ghost edges through the rolls, and the ghost edges read the
    main borders as their own inner neighbors — so the strips evolve WITH
    the main array under the ordinary rolls, no selects and no cross-lane
    splats at all on interior/torus shards (physical-edge shards patch
    their border consumer with the BC by flag-gated select, the free
    kinds).  Cut-side creep (1 lane/sub-step from each block's outer cut)
    reaches the consumed edge columns only after khalo >= k sub-steps.

    Two earlier designs measured slower: evolving the strips OUTSIDE the
    kernel into per-sub-step ghost-column schedules (~300 tiny sequential
    XLA ops per pass — halved the slab rate), and in-kernel strips read
    via per-sub-step column-splat selects (the sublane->lane broadcast
    cost ~10%).  Row p corresponds to tile row p - khalo (the kernel's
    per-block window convention).
    """
    my, mx = tile.shape

    def yext(cols: slice):
        return yhalo[:khalo, cols], yhalo[khalo:, cols]

    def block(from_xhalo: slice, y_cols: slice):
        gb, gt = yext(y_cols)
        return jnp.concatenate([gb, xhalo[:, from_xhalo], gt], axis=0)

    # NB: xhalo is [pad | gl | gr | pad] (gr at _XPAD); yhalo is
    # [pad | gl | tile | gr | pad] (gr at _XPAD + mx).
    rg = block(slice(_XPAD, _XPAD + khalo),
               slice(_XPAD + mx, _XPAD + mx + khalo))
    lg = block(slice(_XPAD - khalo, _XPAD),
               slice(_XPAD - khalo, _XPAD))
    gap = jnp.zeros((my + 2 * khalo, 128 - 2 * khalo), tile.dtype)
    return jnp.concatenate([rg, gap, lg], axis=1)


def sharded_tile_slab_multistep(
    tile,
    xhalo,
    yhalo,
    edge_flags,
    cfg: SimConfig,
    dt: float,
    k: int,
    interpret: bool = False,
    probe: bool = False,
    probe_shape=None,
    probe_dtype: str = "float32",
    khalo: int = 0,
):
    """Sharded-tile FAST path: advance one shard's (my, mx) tile k steps
    straight from the tile + compact halo slabs (no padded-tile
    materialization; see parallel/halo.py::exchange_halos_slabs for the slab
    layout).  ``probe=True`` (with ``probe_shape=(my, mx)``) reports layout
    availability.  Returns the updated interior, or None if no layout.

    One-sided-periodic configs fuse at full k here too: the cyclic slab
    exchange delivers the opposite edge's strip to the periodic-edge
    shards, and the kernel's flag-gated wrap_*_mask consumer patches pin
    the far side's BC at the strip's outer line every sub-step — both
    axes at once compose (the corner wrap data gets both patches).
    """
    my, mx = probe_shape if probe else tile.shape
    fixes, _ = _fixes_and_sides(cfg, k)
    # khalo is k rounded up to the dtype's sublane tile (the caller's
    # exchange depth when given): remainder passes exchange same-width
    # slabs and simply run fewer sub-steps.
    dtype_name = probe_dtype if probe else jnp.dtype(tile.dtype).name
    sub = 16 if dtype_name == "bfloat16" else 8
    khalo8 = khalo or -(-k // sub) * sub
    rest = (
        float(dt), float(cfg.D), float(cfg.vx), float(cfg.vy),
        float(cfg.dx), float(cfg.dy), 0.0,
    )
    # PADLESS fast path: the buffer is (Rbuf, mx + 128) — main lanes plus
    # ONE packed ghost-strip lane tile that evolves with the main array
    # (slab_x_strip_pair) — instead of the 2x128 strip-pad lanes, and 6
    # DMAs instead of 17.  The kernel declines (None) past the chain
    # width knee or for non-chain substep overrides; the strip-pad layout
    # below then serves.
    pcall = _build_multistep_call(
        my, mx, k, khalo8, *rest, *fixes,
        False, False, False, True, True, dtype_name, interpret,
        slab_padless=True,
    )
    if pcall is not None:
        if probe:
            return pcall
        strip = slab_x_strip_pair(tile, xhalo, yhalo, khalo8)
        return pcall(edge_flags.astype(jnp.int32), tile, yhalo, strip)
    call = _build_multistep_call(
        my, mx, k, khalo8, *rest, *fixes,
        False, False, False, True, True, dtype_name, interpret,
    )
    if probe or call is None:
        return call
    return call(edge_flags.astype(jnp.int32), tile, xhalo, yhalo)


def carrier_tile_slab_multistep(
    tile,
    xhalo,
    yhalo,
    flags6,
    cfg: SimConfig,
    dt: float,
    k: int,
    interpret: bool = False,
    probe: bool = False,
    probe_shape=None,
    probe_dtype: str = "float32",
    khalo: int = 0,
):
    """Slab-path pass for one shard of a PADDED CARRIER (grids indivisible
    along both mesh axes — the Pallas upgrade of
    parallel/halo.py::build_padded_gspmd_advance; the reference handles the
    same grids with last-rank remainders, decomp.cpp:29-30).

    The carrier tile is mesh-uniform (MY, MX); the TRUE grid edges sit at
    arbitrary interior positions, so ``flags6`` extends the edge flags to
    (6,) int32: [left, right, bottom, top, ghost_row, ghost_col] where
    ``right``/``top`` mark the shard holding the true edge and
    ``ghost_row``/``ghost_col`` are the tile-local positions of its ghost
    line — consumed by traced-position masked selects in the chained
    kernel form (see _build_kernel_body carrier=True).  Periodic sides
    carry no fixup: the caller stages true wrap blocks into the pad
    region before each pass (both blocks for a torus axis, one for a
    one-sided axis), and a ONE-sided axis's wrap block additionally gets
    the in-kernel consumer patch that pins the opposite side's BC at its
    outer line (wrap_*_mask in _build_kernel_body) — so the reference's
    dev.yaml-style mixes fuse at full k on any carrier grid.
    """
    my, mx = probe_shape if probe else tile.shape
    compat = cfg.strict_reference_compat
    fixes = (
        _fixup_side(cfg.bc.left, compat), _fixup_side(cfg.bc.right, compat),
        _fixup_side(cfg.bc.bottom, compat), _fixup_side(cfg.bc.top, compat),
    )
    # The caller's staging/exchange depth (KH) fixes the slab layout; a
    # remainder pass (k < KH) runs fewer sub-steps on the same shapes.
    # bf16 rounds to its 16-row sublane tile.
    dtype_name = probe_dtype if probe else jnp.dtype(tile.dtype).name
    sub = 16 if dtype_name == "bfloat16" else 8
    khalo8 = khalo or -(-k // sub) * sub
    rest = (
        float(dt), float(cfg.D), float(cfg.vx), float(cfg.vy),
        float(cfg.dx), float(cfg.dy), 0.0,
    )
    # PADLESS roll-wrap layout first (same win as the aligned slab path:
    # no strip-pad lanes, 6 DMAs); the runtime true-edge selects compose
    # with it — only the strip-pad layout below serves tiles past the
    # chain width knee.
    pcall = _build_multistep_call(
        my, mx, k, khalo8, *rest, *fixes,
        False, False, False, True, True, dtype_name, interpret,
        carrier=True, slab_padless=True,
    )
    if pcall is not None:
        if probe:
            return pcall
        strip = slab_x_strip_pair(tile, xhalo, yhalo, khalo8)
        return pcall(flags6.astype(jnp.int32), tile, yhalo, strip)
    call = _build_multistep_call(
        my, mx, k, khalo8, *rest, *fixes,
        False, False, False, True, True, dtype_name, interpret,
        carrier=True,
    )
    if probe or call is None:
        return call
    return call(flags6.astype(jnp.int32), tile, xhalo, yhalo)


def sharded_layout_available(
    cfg: SimConfig,
    dt: float,
    k: int,
    mx: int,
    my: int,
    interpret: bool = False,
    dtype_name: str = "float32",
) -> bool:
    """Static probe: can :func:`sharded_tile_multistep` run on (my, mx)
    tiles of ``dtype_name`` with pass size k?"""
    return tile_region_multistep(
        None, None, cfg, dt, k, my, mx, True, interpret,
        probe=True, probe_dtype=dtype_name,
    ) is not None


def make_pallas_interior_step(
    cfg: SimConfig, dt: float, interpret: bool = False
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Interior step for the sharded path: padded tile -> updated interior,
    falling back to the jnp oracle when no block layout fits."""
    from .stencil import fused_step_storage

    def step(up: jnp.ndarray) -> jnp.ndarray:
        out = prepadded_kernel_step(up, cfg, dt, interpret)
        if out is None:
            # bf16 storage semantics (one rounding/step, f32 math) —
            # matches the multi-step kernel's chained-form cast.
            return fused_step_storage(
                up, cfg.D, cfg.vx, cfg.vy, dt, cfg.dx, cfg.dy
            )
        return out

    return step


def one_sided_periodic_x(cfg: SimConfig) -> bool:
    """Exactly one of left/right periodic (wrap live, i.e. not compat)."""
    if cfg.strict_reference_compat:
        return False
    P = BCType.PERIODIC
    return (cfg.bc.left == P) != (cfg.bc.right == P)


def one_sided_periodic_y(cfg: SimConfig) -> bool:
    """Exactly one of bottom/top periodic (wrap live, i.e. not compat)."""
    if cfg.strict_reference_compat:
        return False
    P = BCType.PERIODIC
    return (cfg.bc.bottom == P) != (cfg.bc.top == P)


def one_sided_periodic(cfg: SimConfig) -> bool:
    """True when exactly one side of an axis is periodic (and wrap is live,
    i.e. not reference-compat) — e.g. the reference's own dev.yaml mixes
    ``bottom=periodic top=dirichlet``.

    The oracle's convention (ops/boundary.py::_ghost_line) re-pins the wrap
    ghost from the opposite edge's CURRENT line every step.  Naive wrap
    DATA in the pads evolves in-slab as if the axis were a full torus,
    missing the other edge's BC, from the second sub-step on.  Every
    CHAINED layout fixes that in-kernel: the wrap block's outer line is
    re-pinned to the opposite side's BC by a masked select on the rolled
    operand (the ``wrap_*_mask`` consumer patches; for padless full-width
    x the main array itself wraps through the roll, so the fixed side's
    ordinary fixup select already is the barrier).  The overlap path's
    band kernels fuse too (sublane-rounded band geometry so the chained
    form engages — parallel/halo.py::build_sharded_overlap_advance); only
    the store/trapezoid A/B forms keep the exact k=1 cap.  This predicate
    is what layout/geometry decisions consult.
    """
    return one_sided_periodic_x(cfg) or one_sided_periodic_y(cfg)


def pick_steps_per_pass(cfg: SimConfig, chunk: int) -> int:
    """Choose k (steps fused per HBM pass) for a ``chunk``-step program.

    Larger k amortizes HBM traffic but grows the halo (2k rows of redundant
    load + compute per block); k=8 also enables the fused-DMA input path.
    One-sided-periodic configs get no special cap: EVERY production layout
    (the single-device fused advance, the sharded slab path, the carrier,
    and the overlap bands) carries wrap data and applies the chained
    form's wrap consumer patches (see :func:`one_sided_periodic`), fusing
    those configs at full k — including both axes one-sided at once.
    Layouts that cannot chain decline at build time and their callers
    fall back to exact k=1 passes themselves (the r02–r03 schedule-era
    ``y_sched``/``x_sched`` cap flags are gone with the machinery).
    """
    # cfg.steps_per_pass overrides the default depth of 8 (still clamped
    # by the chunk and the grid-extent safety floor): deeper passes trade
    # halo-redundant compute for fewer, larger exchanges — the latency
    # lever on DCN-crossing meshes (docs/performance.md).
    cap = getattr(cfg, "steps_per_pass", 0) or 8
    k = min(cap, chunk, max(1, cfg.nx // 32), max(1, cfg.ny // 32))
    return max(1, k)


def build_multistep_advance(
    cfg: SimConfig, dt: float, interpret: bool = False
) -> Callable[[int], Callable]:
    """``advance(chunk)`` -> jitted fn advancing the global field ``chunk``
    steps via multi-step kernel passes (single-device / GSPMD path).

    One-sided-periodic configs fuse at full k in every chained layout:
    live wrap data (the circular roll's own wrap in padless full-width x;
    mod-extent DMA segments / assembled pads elsewhere) plus the
    wrap_*_mask consumer patches.  The r03 transpose route for
    one-sided-x (two transposes per chunk onto the y-schedule machinery,
    and its CLIMATE_SIM_X_SCHED knob) is gone with the schedules it
    worked around: the direct padless layout now handles x one-sidedness
    with a single ordinary fixup select — no transposes, no schedule.
    """
    from .boundary import pad_with_ghosts
    from .stencil import fused_step_storage

    compat = cfg.strict_reference_compat

    def jnp_step(u):
        return fused_step_storage(
            pad_with_ghosts(u, cfg.bc, 0.0, compat),
            cfg.D, cfg.vx, cfg.vy, dt, cfg.dx, cfg.dy,
        )

    @functools.lru_cache(maxsize=None)
    def advance(chunk: int):
        k = pick_steps_per_pass(cfg, chunk)

        def body(u):
            n = 0
            while n < chunk:
                kk = min(k, chunk - n)
                out = multistep_kernel_step(u, cfg, dt, kk, interpret)
                if out is None:
                    out = jnp_step(u)
                    kk = 1
                u = out
                n += kk
            return u

        return jax.jit(body)

    return advance
