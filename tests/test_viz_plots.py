"""Plotting tests (reference analogue: tests/visualization/test_plots.py —
figure/axes structure, overlay text, diff panel, animation save)."""

import numpy as np
import pytest
import matplotlib.pyplot as plt

import visualization.plots as plots
from visualization.plots import animate_from_outputs, compare_fields, imshow_field


@pytest.fixture(autouse=True)
def close_figs():
    yield
    plt.close("all")


def field(ny=8, nx=10, scale=1.0):
    return scale * np.linspace(0, 1, ny * nx).reshape(ny, nx)


def test_imshow_structure_and_overlays():
    U = field()
    meta = {
        "description": "demo",
        "grid": "10 x 8",
        "dt": "0.1",
        "D": "0.5",
        "velocity": "(1,0)",
        "boundary_conditions": "left=dirichlet right=neumann bottom=periodic top=dirichlet",
    }
    fig, ax = imshow_field(U, title="t", overlay_minmax=True, metadata=meta)
    assert ax.get_title() == "t"
    assert ax.get_xlabel() == "x" and ax.get_ylabel() == "y"
    texts = [t.get_text() for t in ax.texts]
    assert any("min=" in t and "max=" in t for t in texts)
    assert any("demo" in t for t in texts)
    # all four BC side labels present
    for lbl in ("dirichlet", "neumann", "periodic"):
        assert any(t == lbl for t in texts)
    # origin lower orientation
    assert ax.images[0].origin == "lower"


def test_imshow_save(tmp_path):
    out = str(tmp_path / "f.png")
    imshow_field(field(), save=out)
    import os

    assert os.path.getsize(out) > 0


def test_compare_diff_panel_count():
    A, B = field(), field(scale=2.0)
    fig, axes = compare_fields(A, B, titles=("a", "b"))
    assert len(axes) == 3
    assert axes[2].get_title() == "B - A"
    fig2, axes2 = compare_fields(A, B, show_diff=False)
    assert len(axes2) == 2


def test_compare_shape_mismatch_asserts():
    with pytest.raises(AssertionError):
        compare_fields(field(8, 10), field(4, 4))


def test_compare_zero_diff_vlim():
    A = field()
    fig, axes = compare_fields(A, A.copy())
    im = axes[2].images[0]
    assert im.get_clim()[1] > 0  # symmetric nonzero limits even for zero diff


def test_animate_monkeypatched_and_gif(tmp_path, monkeypatch):
    frames = {0: field(), 1: field(scale=0.5), 2: field(scale=0.1)}
    monkeypatch.setattr(plots, "list_available_steps", lambda d: [0, 1, 2])

    class FakeReader:  # the one-open-handle frame source animate holds
        def __init__(self, d, var="u"):
            self.num_steps = len(frames)
            self.closed = False

        def frame(self, s):
            return frames[s]

        def close(self):
            self.closed = True

    monkeypatch.setattr(plots, "SnapshotReader", FakeReader)
    out = str(tmp_path / "anim.gif")
    anim, fig, ax = animate_from_outputs("fake", save=out, writer="pillow", fps=2)
    import os

    assert os.path.getsize(out) > 0
    assert isinstance(anim._snapshot_reader, FakeReader)


def test_animate_no_steps_raises(monkeypatch):
    monkeypatch.setattr(plots, "list_available_steps", lambda d: [])
    with pytest.raises(RuntimeError, match="No steps"):
        animate_from_outputs("fake")
