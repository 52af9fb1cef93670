"""Plotting helpers (reference API: visualization/plots.py:84-249).

Same public surface and rendering conventions as the reference:
``origin="lower"``, equal aspect, viridis default; optional min/max overlay
and metadata overlay (description/grid/dt/D/velocity subtitle + per-edge BC
labels parsed from the ``boundary_conditions`` attribute); side-by-side
comparison with an optional symmetric-coolwarm B-A diff panel; lazy-loading
FuncAnimation saved via ffmpeg (.mp4) or pillow (.gif).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import matplotlib.pyplot as plt
from matplotlib.animation import FFMpegWriter, FuncAnimation, PillowWriter

from .io import list_available_steps, load_global


def _render(ax, U, cmap, vmin, vmax):
    """imshow with the fixed orientation conventions (y up, equal aspect)."""
    img = ax.imshow(U, origin="lower", cmap=cmap, vmin=vmin, vmax=vmax)
    ax.set_aspect("equal")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    return img


def _overlay_minmax(ax, U) -> None:
    lo = float(np.nanmin(U))
    hi = float(np.nanmax(U))
    ax.text(
        0.99,
        0.99,
        f"min={lo:.2f}\nmax={hi:.2f}",
        transform=ax.transAxes,
        ha="right",
        va="top",
        fontsize=8,
        color="white",
        bbox=dict(facecolor="black", alpha=0.5, edgecolor="none"),
    )


def _parse_bc_attr(bc_text: str) -> Dict[str, str]:
    """'left=a right=b ...' -> {'left': 'a', ...}; tolerant of junk."""
    out: Dict[str, str] = {}
    try:
        for token in bc_text.split():
            key, _, val = token.partition("=")
            if val:
                out[key] = val
    except Exception:
        return {}
    return out


def _overlay_metadata(ax, metadata: Dict[str, str]) -> None:
    if not metadata:
        return

    parts = []
    for key, label in (("grid", "grid"), ("dt", "dt"), ("D", "D"), ("velocity", "v")):
        val = metadata.get(key, "")
        if val:
            parts.append(f"{label}={val}")
    desc = metadata.get("description", "")
    subtitle = " | ".join(parts)
    if desc or subtitle:
        ax.text(
            0.5,
            0.96,
            f"{desc}\n{subtitle}",
            transform=ax.transAxes,
            ha="center",
            va="top",
            fontsize=9,
            color="gray",
        )

    bcs = _parse_bc_attr(metadata.get("boundary_conditions", ""))
    style = dict(fontsize=9, color="black")
    placements = {
        "left": dict(x=-0.12, y=0.5, rotation=90, ha="right", va="center"),
        "right": dict(x=1.12, y=0.5, rotation=-90, ha="left", va="center"),
        "bottom": dict(x=0.5, y=-0.12, rotation=0, ha="center", va="top"),
        "top": dict(x=0.5, y=1.10, rotation=0, ha="center", va="bottom"),
    }
    for side, pl in placements.items():
        if side in bcs:
            ax.text(
                pl["x"], pl["y"], bcs[side],
                transform=ax.transAxes, rotation=pl["rotation"],
                ha=pl["ha"], va=pl["va"], **style,
            )


def imshow_field(
    U: np.ndarray,
    title: Optional[str] = None,
    cmap: str = "viridis",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    ax: Optional[plt.Axes] = None,
    show: bool = False,
    save: Optional[str] = None,
    overlay_minmax: bool = False,
    metadata: Optional[Dict[str, str]] = None,
):
    """Render one snapshot; returns (fig, ax)."""
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 6))
    else:
        fig = ax.figure

    _render(ax, U, cmap, vmin, vmax)
    if title:
        ax.set_title(title)
    if overlay_minmax:
        _overlay_minmax(ax, U)
    if metadata:
        _overlay_metadata(ax, metadata)

    if save:
        fig.savefig(save, dpi=150, bbox_inches="tight")
    if show:
        plt.show()
    return fig, ax


def compare_fields(
    A: np.ndarray,
    B: np.ndarray,
    titles: Tuple[str, str] = ("A", "B"),
    cmap: str = "viridis",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    show_diff: bool = True,
    diff_cmap: str = "coolwarm",
    diff_vlim: Optional[float] = None,
    show: bool = False,
    save: Optional[str] = None,
    overlay_minmax: bool = False,
    metadata_a: Optional[Dict[str, str]] = None,
    metadata_b: Optional[Dict[str, str]] = None,
):
    """Side-by-side panels on a shared color scale, optional B-A diff panel
    with symmetric limits; returns (fig, axes)."""
    assert A.shape == B.shape, "Fields must have the same shape"

    if vmin is None:
        vmin = float(np.nanmin([A.min(), B.min()]))
    if vmax is None:
        vmax = float(np.nanmax([A.max(), B.max()]))

    ncols = 3 if show_diff else 2
    fig, axes = plt.subplots(1, ncols, figsize=(6 * ncols, 6))

    for ax, U, title, meta in zip(axes[:2], (A, B), titles, (metadata_a, metadata_b)):
        _render(ax, U, cmap, vmin, vmax)
        ax.set_title(title)
        if overlay_minmax:
            _overlay_minmax(ax, U)
        if meta:
            _overlay_metadata(ax, meta)

    if show_diff:
        D = B - A
        if diff_vlim is None:
            peak = float(np.nanmax(np.abs(D)))
            diff_vlim = peak if peak > 0 else 1e-16
        _render(axes[2], D, diff_cmap, -diff_vlim, diff_vlim)
        axes[2].set_title("B - A")

    if save:
        fig.savefig(save, dpi=150, bbox_inches="tight")
    if show:
        plt.show()
    return fig, axes


def animate_from_outputs(
    base_outputs_dir: str,
    var: str = "u",
    steps: Optional[Sequence[int]] = None,
    interval_ms: int = 150,
    fps: int = 12,
    repeat: bool = True,
    cmap: str = "viridis",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    save: Optional[str] = None,
    writer: Optional[str] = None,
    title_prefix: str = "timestep",
    show: bool = False,
    overlay_minmax: bool = False,
    metadata: Optional[Dict[str, str]] = None,
):
    """Animate snapshots (lazily loaded per frame); color limits default to
    the first/last frame envelope; returns (anim, fig, ax)."""
    if steps is None:
        steps = list_available_steps(base_outputs_dir)
    if not steps:
        raise RuntimeError(f"No steps found in {base_outputs_dir}")

    first = load_global(base_outputs_dir, steps[0], var=var)
    last = load_global(base_outputs_dir, steps[-1], var=var)
    if vmin is None:
        vmin = float(min(first.min(), last.min()))
    if vmax is None:
        vmax = float(max(first.max(), last.max()))

    fig, ax = plt.subplots(figsize=(6, 6))
    img = _render(ax, first, cmap, vmin, vmax)
    title = ax.set_title(f"{title_prefix}: {steps[0]}")
    if overlay_minmax:
        _overlay_minmax(ax, first)
    if metadata:
        _overlay_metadata(ax, metadata)

    def _update(i: int):
        step = steps[i]
        U = load_global(base_outputs_dir, step, var=var)
        img.set_data(U)
        title.set_text(f"{title_prefix}: {step}")
        for t in list(ax.texts):
            t.remove()
        if overlay_minmax:
            _overlay_minmax(ax, U)
        if metadata:
            _overlay_metadata(ax, metadata)
        return [img]

    anim = FuncAnimation(
        fig, _update, frames=len(steps), interval=interval_ms, blit=False, repeat=repeat
    )

    if save:
        if writer is None:
            writer = "ffmpeg" if save.lower().endswith(".mp4") else "pillow"
        if writer == "ffmpeg":
            anim.save(save, writer=FFMpegWriter(fps=fps, bitrate=-1))
        else:
            anim.save(save, writer=PillowWriter(fps=fps))
    if show:
        plt.show()
    return anim, fig, ax
