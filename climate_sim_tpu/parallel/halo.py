"""Halo exchange and the explicitly-sharded step (shard_map + ppermute).

TPU-native redesign of the reference's nonblocking MPI halo exchange
(reference: src/halo.cpp:6-49 — 8x Isend/Irecv of width-1 faces with derived
datatypes + Waitall) and physical-edge BC application (boundary.cpp:12-54).

Design:

* The global (ny, nx) field is sharded ``P('y','x')`` over a named mesh.
* Inside ``shard_map`` each shard pulls its four width-1 ghost faces with a
  single *cyclic* ``jax.lax.ppermute`` shift per direction — one ICI hop on
  the torus.  Using a cyclic (not edge-truncated) permutation means edge
  shards receive the wrapped face "for free", which is exactly what a true
  periodic BC needs; non-periodic sides then overwrite their ghost face with
  the Dirichlet value or the Neumann mirror, selected by
  ``lax.axis_index`` masks (the ``MPI_PROC_NULL`` analogue).
* Row faces span the full padded width including corner ghosts, matching the
  reference's ``MPI_Type_contiguous(nx_total)`` row messages (halo.cpp:16-18).
  Corners are never read by the 5-point stencil.
* A whole ``out_every`` chunk of steps runs inside one traced
  ``lax.fori_loop`` within shard_map, so the per-step halo exchange never
  leaves the device program — no host round-trips in the hot loop.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from ..config import BCType, SimConfig
from ..ops.boundary import _ghost_line


def _cyclic_perm(n: int, shift: int):
    """Permutation pairs for a cyclic shift by ``shift`` along an axis of n."""
    return [(i, (i + shift) % n) for i in range(n)]


def exchange_and_pad(
    u: jnp.ndarray,
    cfg: SimConfig,
    px: int,
    py: int,
    value: float = 0.0,
) -> jnp.ndarray:
    """Inside shard_map: return the (ny_l+2, nx_l+2) ghost-padded local tile.

    One cyclic ppermute per direction fetches the wrap/neighbor faces; BC
    logic overwrites ghost faces on mesh-edge shards for non-periodic sides.
    Must be called inside a shard_map over mesh axes ('y', 'x').
    """
    bc = cfg.bc
    compat = cfg.strict_reference_compat

    xi = lax.axis_index("x")
    yi = lax.axis_index("y")

    # --- x direction (columns; 'left'/'right') ---
    right_face = u[:, -1:]
    left_face = u[:, :1]
    # ghost_left[dev i] = right face of dev i-1 (cyclic)  => shift +1
    ghost_left = lax.ppermute(right_face, "x", _cyclic_perm(px, +1))
    # ghost_right[dev i] = left face of dev i+1 (cyclic)  => shift -1
    ghost_right = lax.ppermute(left_face, "x", _cyclic_perm(px, -1))

    def bc_face(side: BCType, mirror, wrapped):
        # Single source of truth for the BC->ghost mapping (incl. the
        # compat stale-zero periodic emulation): ops/boundary._ghost_line.
        return _ghost_line(side, mirror, wrapped, value, compat)

    ghost_left = jnp.where(xi == 0, bc_face(bc.left, left_face, ghost_left), ghost_left)
    ghost_right = jnp.where(
        xi == px - 1, bc_face(bc.right, right_face, ghost_right), ghost_right
    )
    mid = jnp.concatenate([ghost_left, u, ghost_right], axis=1)

    # --- y direction (rows; 'bottom'/'top'), full padded width incl corners ---
    top_face = mid[-1:, :]
    bottom_face = mid[:1, :]
    ghost_bottom = lax.ppermute(top_face, "y", _cyclic_perm(py, +1))
    ghost_top = lax.ppermute(bottom_face, "y", _cyclic_perm(py, -1))

    ghost_bottom = jnp.where(
        yi == 0, bc_face(bc.bottom, bottom_face, ghost_bottom), ghost_bottom
    )
    ghost_top = jnp.where(yi == py - 1, bc_face(bc.top, top_face, ghost_top), ghost_top)

    return jnp.concatenate([ghost_bottom, mid, ghost_top], axis=0)


def exchange_halos_k(
    u: jnp.ndarray,
    px: int,
    py: int,
    k: int,
) -> jnp.ndarray:
    """Inside shard_map: return the (my+2k, mx+2k) tile with k-wide halos
    pulled from neighbors by cyclic ppermute (x faces first, then full-width
    y slabs so corner ghosts carry diagonal-neighbor data — the width-k
    generalization of the reference's full-row messages, halo.cpp:16-18).

    No BC logic here: edge shards receive wrap data, which is exactly right
    for periodic sides; non-periodic physical ghosts are re-supplied every
    sub-step by the kernel's edge-flag-gated fixups.
    """
    right_face = u[:, -k:]
    left_face = u[:, :k]
    ghost_left = lax.ppermute(right_face, "x", _cyclic_perm(px, +1))
    ghost_right = lax.ppermute(left_face, "x", _cyclic_perm(px, -1))
    mid = jnp.concatenate([ghost_left, u, ghost_right], axis=1)

    top_slab = mid[-k:, :]
    bottom_slab = mid[:k, :]
    ghost_bottom = lax.ppermute(top_slab, "y", _cyclic_perm(py, +1))
    ghost_top = lax.ppermute(bottom_slab, "y", _cyclic_perm(py, -1))
    return jnp.concatenate([ghost_bottom, mid, ghost_top], axis=0)


def build_sharded_multistep_advance(
    cfg: SimConfig,
    mesh: Mesh,
    dt: float,
    interpret: bool = False,
    dtype_name: str = "float32",
):
    """Multi-chip fast path: ``advance(chunk)`` advancing the sharded field
    ``chunk`` steps with ONE k-wide halo exchange per k steps, each shard
    running the Pallas multi-step kernel on its tile (in-kernel BC fixups
    gated by physical-edge flags).  Halo traffic per step matches the
    per-step scheme, but in 1/k as many (k-times larger) ICI messages.

    Returns None when the kernel has no layout for the shard shape (caller
    falls back to :func:`build_sharded_advance`).
    """
    import dataclasses

    from ..ops.pallas_stencil import (
        pick_steps_per_pass,
        sharded_layout_available,
        sharded_tile_multistep,
    )

    px = mesh.shape["x"]
    py = mesh.shape["y"]
    if cfg.nx % px or cfg.ny % py:
        return None
    mx = cfg.nx // px
    my = cfg.ny // py
    spec = PartitionSpec("y", "x")

    tile_cfg = dataclasses.replace(cfg, nx=mx, ny=my)
    k = pick_steps_per_pass(tile_cfg, cfg.out_every or 8)
    # Static layout probe for every pass size that can occur (k and the
    # chunk remainders) — all shapes are static, so this decides up front.
    if not all(
        sharded_layout_available(cfg, dt, kk, mx, my, interpret, dtype_name)
        for kk in range(1, k + 1)
    ):
        return None

    def tile_pass(u_local: jnp.ndarray, kk: int) -> jnp.ndarray:
        padded = exchange_halos_k(u_local, px, py, kk)
        xi = lax.axis_index("x")
        yi = lax.axis_index("y")
        flags = jnp.stack(
            [xi == 0, xi == px - 1, yi == 0, yi == py - 1]
        ).astype(jnp.int32)
        return sharded_tile_multistep(
            padded, flags, cfg, dt, kk, mx, interpret=interpret
        )

    @functools.lru_cache(maxsize=None)
    def advance(chunk: int):
        def body(u_local):
            n = 0
            while n < chunk:
                kk = min(k, chunk - n)
                u_local = tile_pass(u_local, kk)
                n += kk
            return u_local

        # check_vma=False: pallas_call outputs carry no varying-mesh-axes
        # metadata; the in/out specs fully pin the sharding here.
        sharded = jax.shard_map(
            body, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
        )
        return jax.jit(sharded)

    return advance


def build_sharded_advance(
    cfg: SimConfig,
    mesh: Mesh,
    dt: float,
    interior_step: Callable[[jnp.ndarray], jnp.ndarray],
) -> Callable[[int], Callable]:
    """Return ``advance(k)`` -> jitted fn advancing the sharded global field
    k steps (halo exchange + BC + fused stencil per step, all on device).

    ``interior_step`` maps a ghost-padded local tile (ny_l+2, nx_l+2) to the
    updated interior (ny_l, nx_l) — either the jnp oracle or a Pallas kernel.
    """
    px = mesh.shape["x"]
    py = mesh.shape["y"]
    spec = PartitionSpec("y", "x")

    def one_step(u_local: jnp.ndarray) -> jnp.ndarray:
        up = exchange_and_pad(u_local, cfg, px, py, value=0.0)
        return interior_step(up)

    @functools.lru_cache(maxsize=None)
    def advance(k: int):
        def body(u_local):
            return lax.fori_loop(0, k, lambda i, v: one_step(v), u_local)

        sharded = jax.shard_map(body, mesh=mesh, in_specs=spec, out_specs=spec)
        return jax.jit(sharded)

    return advance
