"""Figure builders for climate_sim_tpu snapshot outputs.

Behavioral parity targets (reference ``visualization/plots.py:84-249``): a
single-snapshot renderer, a side-by-side comparison with an optional
difference panel, and an animation exporter.  The implementation is a small
declarative panel engine: every figure is described as a sequence of
:class:`_Panel` specs (data + colormap + overlay "stamps"), and one
``_compose`` routine materializes the whole figure.  Overlay stamps are
composable callables so the same extrema / run-info / edge-label annotations
work identically across all three entry points.

Public signatures are kept compatible with the reference so downstream
notebooks keep working; everything behind them is independent.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import matplotlib.pyplot as plt
import numpy as np
from matplotlib.animation import FuncAnimation

from .io import SnapshotReader, list_available_steps, load_global

# Rendering conventions: index (0,0) at the lower-left (y up), square pixels.
_PANEL_INCHES = 5.0
_SAVE_DPI = 144

# Where each boundary-condition label sits, as (x-frac, y-frac, rotation,
# horizontal anchor, vertical anchor) in axes coordinates.
_EDGE_SLOTS: Dict[str, Tuple[float, float, float, str, str]] = {
    "left": (-0.10, 0.5, 90.0, "right", "center"),
    "right": (1.10, 0.5, -90.0, "left", "center"),
    "bottom": (0.5, -0.10, 0.0, "center", "top"),
    "top": (0.5, 1.08, 0.0, "center", "bottom"),
}

# Metadata keys that form the one-line run summary, with display labels.
_RUN_INFO_KEYS = (("grid", "grid"), ("dt", "dt"), ("D", "D"), ("velocity", "v"))

Stamp = Callable[[plt.Axes, np.ndarray], List[plt.Artist]]


def _stamp_extrema(ax: plt.Axes, data: np.ndarray) -> List[plt.Artist]:
    """Pin the field's min/max in the top-right corner."""
    label = "min={:.2f}\nmax={:.2f}".format(
        float(np.nanmin(data)), float(np.nanmax(data))
    )
    artist = ax.annotate(
        label,
        xy=(1.0, 1.0),
        xycoords="axes fraction",
        xytext=(-3, -3),
        textcoords="offset points",
        ha="right",
        va="top",
        fontsize=8,
        color="white",
        bbox={"facecolor": "black", "alpha": 0.5, "edgecolor": "none"},
    )
    return [artist]


def _decode_edges(spec: str) -> Dict[str, str]:
    """Parse ``"left=dirichlet right=neumann"`` into a side->label map.

    Tokens that are not ``word=value`` pairs are ignored rather than raised,
    matching the tolerant contract of the reference overlay.
    """
    return {side: label for side, label in re.findall(r"(\w+)=(\S+)", spec or "")}


def _make_metadata_stamp(metadata: Dict[str, str]) -> Stamp:
    """Build a stamp that writes the run summary and per-edge BC labels."""
    summary_bits = [
        f"{label}={metadata[key]}" for key, label in _RUN_INFO_KEYS if metadata.get(key)
    ]
    headline = metadata.get("description", "")
    summary = " | ".join(summary_bits)
    edges = _decode_edges(metadata.get("boundary_conditions", ""))

    def stamp(ax: plt.Axes, _data: np.ndarray) -> List[plt.Artist]:
        artists: List[plt.Artist] = []
        if headline or summary:
            artists.append(
                ax.annotate(
                    f"{headline}\n{summary}",
                    xy=(0.5, 1.0),
                    xycoords="axes fraction",
                    xytext=(0, -6),
                    textcoords="offset points",
                    ha="center",
                    va="top",
                    fontsize=9,
                    color="gray",
                )
            )
        for side, label in edges.items():
            slot = _EDGE_SLOTS.get(side)
            if slot is None:
                continue
            xf, yf, rot, ha, va = slot
            artists.append(
                ax.text(
                    xf,
                    yf,
                    label,
                    transform=ax.transAxes,
                    rotation=rot,
                    ha=ha,
                    va=va,
                    fontsize=9,
                    color="black",
                )
            )
        return artists

    return stamp


def _gather_stamps(
    overlay_minmax: bool, metadata: Optional[Dict[str, str]]
) -> Tuple[Stamp, ...]:
    stamps: List[Stamp] = []
    if overlay_minmax:
        stamps.append(_stamp_extrema)
    if metadata:
        stamps.append(_make_metadata_stamp(metadata))
    return tuple(stamps)


@dataclass
class _Panel:
    """One image panel in a composed figure."""

    data: np.ndarray
    title: Optional[str] = None
    cmap: str = "viridis"
    clim: Tuple[Optional[float], Optional[float]] = (None, None)
    stamps: Tuple[Stamp, ...] = dc_field(default_factory=tuple)


def _draw_panel(ax: plt.Axes, panel: _Panel) -> plt.Artist:
    """Render one panel onto an existing axes; returns the image artist."""
    lo, hi = panel.clim
    image = ax.imshow(panel.data, origin="lower", cmap=panel.cmap, vmin=lo, vmax=hi)
    ax.set_aspect("equal")
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    if panel.title is not None:
        ax.set_title(panel.title)
    for stamp in panel.stamps:
        stamp(ax, panel.data)
    return image


def _compose(panels: Sequence[_Panel]):
    """Materialize a row of panels as a figure; returns (fig, axes-list)."""
    n = len(panels)
    fig, axes = plt.subplots(
        1, n, figsize=(_PANEL_INCHES * n, _PANEL_INCHES), squeeze=False
    )
    row = list(axes[0])
    for ax, panel in zip(row, panels):
        _draw_panel(ax, panel)
    return fig, row


def _finish(fig, show: bool, save: Optional[str]) -> None:
    if save:
        fig.savefig(save, dpi=_SAVE_DPI, bbox_inches="tight")
    if show:
        plt.show()


def _shared_range(
    arrays: Sequence[np.ndarray], lo: Optional[float], hi: Optional[float]
) -> Tuple[float, float]:
    """Fill in missing color limits from the joint data envelope."""
    if lo is None:
        lo = float(min(np.nanmin(a) for a in arrays))
    if hi is None:
        hi = float(max(np.nanmax(a) for a in arrays))
    return lo, hi


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
    """Render one snapshot field; returns ``(fig, ax)``.

    Reference behavior target: visualization/plots.py:84-117.
    """
    panel = _Panel(
        data=np.asarray(U),
        title=title,
        cmap=cmap,
        clim=(vmin, vmax),
        stamps=_gather_stamps(overlay_minmax, metadata),
    )
    if ax is None:
        fig, (ax,) = _compose([panel])
    else:
        fig = ax.figure
        _draw_panel(ax, panel)
    _finish(fig, show, save)
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
    """Two fields on one shared color scale, plus an optional ``B - A``
    panel with symmetric limits; returns ``(fig, axes)``.

    Reference behavior target: visualization/plots.py:120-177.
    """
    A = np.asarray(A)
    B = np.asarray(B)
    assert A.shape == B.shape, "Fields must have the same shape"

    lo, hi = _shared_range((A, B), vmin, vmax)
    panels = [
        _Panel(A, titles[0], cmap, (lo, hi), _gather_stamps(overlay_minmax, metadata_a)),
        _Panel(B, titles[1], cmap, (lo, hi), _gather_stamps(overlay_minmax, metadata_b)),
    ]
    if show_diff:
        delta = B - A
        if diff_vlim is None:
            # Keep the limits strictly positive even for an identical pair so
            # the symmetric colormap stays centered and well-defined.
            diff_vlim = max(float(np.nanmax(np.abs(delta))), np.finfo(np.float64).tiny)
        panels.append(_Panel(delta, "B - A", diff_cmap, (-diff_vlim, diff_vlim)))

    fig, axes = _compose(panels)
    _finish(fig, show, save)
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
    """Animate snapshots, loading each frame lazily; returns
    ``(anim, fig, ax)``.

    Color limits default to the envelope of the first and last frames so the
    scale is stable without reading every record up front.  Reference
    behavior target: visualization/plots.py:180-249.
    """
    if steps is None:
        steps = list_available_steps(base_outputs_dir)
    steps = list(steps)
    if not steps:
        raise RuntimeError(f"No steps found in {base_outputs_dir}")

    # One open handle for the animation's lifetime — per-frame load_global
    # would re-list the directory and re-parse the file header every frame.
    reader = SnapshotReader(base_outputs_dir, var=var)
    frame = reader.frame

    first = frame(steps[0])
    last = frame(steps[-1])
    lo, hi = _shared_range((first, last), vmin, vmax)

    stamps = _gather_stamps(overlay_minmax, metadata)
    panel = _Panel(first, f"{title_prefix}: {steps[0]}", cmap, (lo, hi))
    fig, (ax,) = _compose([panel])
    image = ax.images[0]
    # Stamp artists are tracked so each frame can replace exactly its own
    # overlays without disturbing any other text on the axes.
    live: List[plt.Artist] = []

    def restamp(data: np.ndarray) -> None:
        while live:
            live.pop().remove()
        for stamp in stamps:
            live.extend(stamp(ax, data))

    restamp(first)

    def advance(i: int):
        data = frame(steps[i])
        image.set_data(data)
        ax.set_title(f"{title_prefix}: {steps[i]}")
        restamp(data)
        return [image]

    anim = FuncAnimation(
        fig,
        advance,
        frames=len(steps),
        interval=interval_ms,
        blit=False,
        repeat=repeat,
    )
    # The reader lives as long as the animation can still draw frames:
    # keep a reference on the anim and close (idempotently) with the figure.
    anim._snapshot_reader = reader
    fig.canvas.mpl_connect("close_event", lambda _e: reader.close())

    if save:
        if writer is None:
            writer = "ffmpeg" if save.lower().endswith(".mp4") else "pillow"
        anim.save(save, writer=writer, fps=fps)
    if show:
        plt.show()
    return anim, fig, ax
