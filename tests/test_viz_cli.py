"""climate-vis CLI tests (reference analogue: tests/visualization/test_cli.py
— parser wiring, step grammar, SystemExit contracts)."""

import numpy as np
import pytest

import visualization.cli as cli
from visualization.cli import _parse_steps_arg, build_parser, main
from test_viz_io import make_snapshots


def test_step_grammar():
    avail = list(range(10))
    assert _parse_steps_arg(None, avail) == avail
    assert _parse_steps_arg("2-5", avail) == [2, 3, 4, 5]
    assert _parse_steps_arg("7-", avail) == [7, 8, 9]
    assert _parse_steps_arg("-3", avail) == [0, 1, 2, 3]
    assert _parse_steps_arg("1,4,8", avail) == [1, 4, 8]
    assert _parse_steps_arg("3,", avail) == [3]


def test_parser_wiring(monkeypatch):
    called = {}
    monkeypatch.setattr(cli, "cmd_show", lambda a: called.setdefault("show", a))
    parser = build_parser()
    args = parser.parse_args(["show", "--dir", "d", "--step", "3", "--overlay-minmax"])
    assert args.dir == "d" and args.step == 3 and args.overlay_minmax
    assert args.cmd == "show"
    # func defaults are bound at parser construction; the parser above was
    # built AFTER patching, so dispatching proves show -> cmd_show wiring.
    args.func(args)
    assert called == {"show": args}


def test_show_requires_dir():
    with pytest.raises(SystemExit):
        build_parser().parse_args(["show"])


def test_show_empty_dir_systemexit(tmp_path):
    with pytest.raises(SystemExit, match="No snapshots"):
        main(["show", "--dir", str(tmp_path), "--save", str(tmp_path / "x.png")])


def test_animate_empty_dir_systemexit(tmp_path):
    with pytest.raises(SystemExit, match="No snapshots"):
        main(["animate", "--dir", str(tmp_path), "--save", str(tmp_path / "x.gif")])


def test_show_end_to_end(tmp_path):
    make_snapshots(
        tmp_path,
        [np.zeros((4, 6)), np.ones((4, 6))],
        attrs={"description": "d", "boundary_conditions": "left=dirichlet"},
    )
    out = str(tmp_path / "plot.png")
    main(["show", "--dir", str(tmp_path), "--save", out, "--show-meta",
          "--overlay-minmax"])
    import os

    assert os.path.getsize(out) > 0


def test_compare_end_to_end(tmp_path):
    da = tmp_path / "a"
    db = tmp_path / "b"
    da.mkdir()
    db.mkdir()
    make_snapshots(da, [np.zeros((4, 6))])
    make_snapshots(db, [np.ones((4, 6))])
    out = str(tmp_path / "cmp.png")
    main(["compare", "--dir-a", str(da), "--dir-b", str(db), "--step", "0",
          "--save", out])
    import os

    assert os.path.getsize(out) > 0


def test_animate_end_to_end(tmp_path):
    make_snapshots(tmp_path, [np.full((4, 6), float(t)) for t in range(5)])
    out = str(tmp_path / "a.gif")
    main(["animate", "--dir", str(tmp_path), "--save", out, "--writer", "pillow",
          "--steps", "1-3"])
    import os

    assert os.path.getsize(out) > 0


def test_animate_range_selection(tmp_path):
    make_snapshots(tmp_path, [np.full((4, 6), float(t)) for t in range(6)])
    out = str(tmp_path / "b.gif")
    main(["animate", "--dir", str(tmp_path), "--save", out, "--writer", "pillow",
          "--start", "1", "--end", "5", "--stride", "2"])
    import os

    assert os.path.getsize(out) > 0
