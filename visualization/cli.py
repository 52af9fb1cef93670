"""``climate-vis`` command-line tool.

Flag surface matches the reference CLI (``visualization/cli.py:94-167``) so
existing invocations keep working: ``show`` renders one snapshot,
``compare`` puts two runs side by side, ``animate`` exports an mp4/gif.
The parser itself is generated from a declarative command table rather than
hand-wired per subcommand.
"""

from __future__ import annotations

import argparse
import re
from typing import Dict, List, Optional, Sequence

from .io import list_available_steps, load_global, load_metadata
from .plots import animate_from_outputs, compare_fields, imshow_field

_RANGE_RE = re.compile(r"(\d*)-(\d*)\Z")


def _parse_steps_arg(steps_arg: Optional[str], avail: Sequence[int]) -> Sequence[int]:
    """Step-selection grammar: ``a-b`` / ``a-`` / ``-b`` ranges (clamped to
    what exists) or an explicit ``i,j,k`` list.  ``None`` selects everything.

    Reference grammar: visualization/cli.py:7-16.
    """
    if steps_arg is None:
        return avail
    matched = _RANGE_RE.match(steps_arg.strip())
    if matched:
        lo_text, hi_text = matched.groups()
        lo = int(lo_text) if lo_text else (avail[0] if avail else 0)
        hi = int(hi_text) if hi_text else (avail[-1] if avail else lo)
        return [s for s in avail if lo <= s <= hi]
    return [int(tok) for tok in steps_arg.split(",") if tok.strip()]


def _require_steps(outputs_dir: str) -> List[int]:
    """All available snapshot steps, or a clean exit if the run is empty."""
    avail = list(list_available_steps(outputs_dir))
    if not avail:
        raise SystemExit(f"No snapshots found under {outputs_dir}")
    return avail


def _meta_for(ns: argparse.Namespace, outputs_dir: str):
    return load_metadata(outputs_dir) if ns.show_meta else None


def _style_of(ns: argparse.Namespace) -> Dict[str, object]:
    """The shared rendering kwargs every subcommand forwards."""
    return {
        "cmap": ns.cmap,
        "vmin": ns.vmin,
        "vmax": ns.vmax,
        "show": ns.show,
        "save": ns.save,
        "overlay_minmax": ns.overlay_minmax,
    }


def cmd_show(ns: argparse.Namespace) -> None:
    avail = _require_steps(ns.dir)
    step = avail[-1] if ns.step is None else ns.step
    imshow_field(
        load_global(ns.dir, step, var=ns.var),
        title=ns.title or f"{ns.dir} :: step {step}",
        metadata=_meta_for(ns, ns.dir),
        **_style_of(ns),
    )


def cmd_compare(ns: argparse.Namespace) -> None:
    fields = [
        load_global(d, ns.step, var=v) for d, v in ((ns.dir_a, ns.var_a), (ns.dir_b, ns.var_b))
    ]
    compare_fields(
        *fields,
        titles=(ns.title_a or "A", ns.title_b or "B"),
        show_diff=not ns.no_diff,
        diff_cmap=ns.diff_cmap,
        diff_vlim=ns.diff_vlim,
        metadata_a=_meta_for(ns, ns.dir_a),
        metadata_b=_meta_for(ns, ns.dir_b),
        **_style_of(ns),
    )


def _select_frames(ns: argparse.Namespace, avail: Sequence[int]) -> Sequence[int]:
    """Resolve the animate selection: explicit grammar wins, then the
    start/end/stride window, then everything."""
    if ns.steps:
        return _parse_steps_arg(ns.steps, avail)
    if ns.start is None and ns.end is None and ns.stride is None:
        return avail
    lo = avail[0] if ns.start is None else ns.start
    hi = avail[-1] if ns.end is None else ns.end
    window = [s for s in avail if lo <= s <= hi]
    return window[:: ns.stride or 1]


def cmd_animate(ns: argparse.Namespace) -> None:
    avail = _require_steps(ns.dir)
    animate_from_outputs(
        ns.dir,
        var=ns.var,
        steps=_select_frames(ns, avail),
        interval_ms=ns.interval,
        fps=ns.fps,
        repeat=not ns.no_repeat,
        writer=ns.writer,
        title_prefix=ns.title_prefix,
        metadata=_meta_for(ns, ns.dir),
        **_style_of(ns),
    )


# Declarative command table: subcommand -> (help, handler name, extra args).
# Shared style flags are appended to every subcommand.  Each arg row is
# (flag, add_argument kwargs).
_STYLE_ARGS = [
    ("--cmap", {"default": "viridis"}),
    ("--vmin", {"type": float}),
    ("--vmax", {"type": float}),
    ("--show", {"action": "store_true"}),
    ("--overlay-minmax", {"action": "store_true"}),
]

_COMMANDS = {
    "show": {
        "help": "Render a single snapshot",
        "handler": "cmd_show",
        "args": [
            ("--dir", {"required": True}),
            ("--var", {"default": "u"}),
            ("--step", {"type": int}),
            ("--title", {}),
            ("--save", {}),
            ("--show-meta", {"action": "store_true", "help": "Overlay metadata on image"}),
        ],
    },
    "compare": {
        "help": "Side-by-side comparison",
        "handler": "cmd_compare",
        "args": [
            ("--dir-a", {"required": True}),
            ("--dir-b", {"required": True}),
            ("--var-a", {"default": "u"}),
            ("--var-b", {"default": "u"}),
            ("--step", {"type": int, "required": True}),
            ("--title-a", {}),
            ("--title-b", {}),
            ("--no-diff", {"action": "store_true"}),
            ("--diff-cmap", {"default": "coolwarm"}),
            ("--diff-vlim", {"type": float}),
            ("--save", {}),
            ("--show-meta", {"action": "store_true", "help": "Overlay metadata on images"}),
        ],
    },
    "animate": {
        "help": "Create animation",
        "handler": "cmd_animate",
        "args": [
            ("--dir", {"required": True}),
            ("--var", {"default": "u"}),
            ("--steps", {}),
            ("--start", {"type": int}),
            ("--end", {"type": int}),
            ("--stride", {"type": int}),
            ("--interval", {"type": int, "default": 150}),
            ("--fps", {"type": int, "default": 12}),
            ("--no-repeat", {"action": "store_true"}),
            ("--save", {"required": True}),
            ("--writer", {"choices": ["ffmpeg", "pillow"]}),
            ("--title-prefix", {"default": "timestep"}),
            ("--show-meta", {"action": "store_true", "help": "Overlay metadata on animation"}),
        ],
    },
}


def build_parser() -> argparse.ArgumentParser:
    root = argparse.ArgumentParser(
        prog="climate-vis",
        description="Quick CLI for visualizing climate_sim outputs.",
    )
    subs = root.add_subparsers(dest="cmd", required=True)
    for name, spec in _COMMANDS.items():
        sp = subs.add_parser(name, help=spec["help"])
        for flag, kwargs in spec["args"] + _STYLE_ARGS:
            sp.add_argument(flag, **kwargs)
        # Handler is resolved through module globals at build time so tests
        # (and embedders) can swap it before constructing the parser.
        sp.set_defaults(func=globals()[spec["handler"]])
    return root


def main(argv: Optional[Sequence[str]] = None) -> None:
    ns = build_parser().parse_args(argv)
    ns.func(ns)


if __name__ == "__main__":
    main()
