"""climate-vis CLI (reference API: visualization/cli.py:94-167).

Subcommands: ``show`` (one snapshot), ``compare`` (two dirs side-by-side),
``animate`` (mp4/gif).  Step-selection grammar for --steps: "a-b", "a-",
"-b", or "i,j,k".
"""

from __future__ import annotations

import argparse
from typing import Optional, Sequence

from .io import list_available_steps, load_global, load_metadata
from .plots import animate_from_outputs, compare_fields, imshow_field


def _parse_steps_arg(steps_arg: Optional[str], avail: Sequence[int]) -> Sequence[int]:
    """Range/list grammar (reference: cli.py:7-16)."""
    if steps_arg is None:
        return avail
    s = steps_arg.strip()
    if "-" in s:
        lo_s, hi_s = s.split("-", 1)
        lo = int(lo_s) if lo_s else (avail[0] if avail else 0)
        hi = int(hi_s) if hi_s else (avail[-1] if avail else lo)
        return [k for k in avail if lo <= k <= hi]
    return [int(tok) for tok in s.split(",") if tok.strip()]


def cmd_show(args: argparse.Namespace) -> None:
    steps = list_available_steps(args.dir)
    if not steps:
        raise SystemExit(f"No snapshots found in {args.dir}/snapshots")
    step = args.step if args.step is not None else steps[-1]
    U = load_global(args.dir, step, var=args.var)
    meta = load_metadata(args.dir) if args.show_meta else None
    imshow_field(
        U,
        title=args.title or f"{args.dir} :: step {step}",
        cmap=args.cmap,
        vmin=args.vmin,
        vmax=args.vmax,
        show=args.show,
        save=args.save,
        overlay_minmax=args.overlay_minmax,
        metadata=meta,
    )


def cmd_compare(args: argparse.Namespace) -> None:
    A = load_global(args.dir_a, args.step, var=args.var_a)
    B = load_global(args.dir_b, args.step, var=args.var_b)
    compare_fields(
        A,
        B,
        titles=(args.title_a or "A", args.title_b or "B"),
        cmap=args.cmap,
        vmin=args.vmin,
        vmax=args.vmax,
        show_diff=not args.no_diff,
        diff_cmap=args.diff_cmap,
        diff_vlim=args.diff_vlim,
        show=args.show,
        save=args.save,
        overlay_minmax=args.overlay_minmax,
        metadata_a=load_metadata(args.dir_a) if args.show_meta else None,
        metadata_b=load_metadata(args.dir_b) if args.show_meta else None,
    )


def cmd_animate(args: argparse.Namespace) -> None:
    avail = list_available_steps(args.dir)
    if not avail:
        raise SystemExit(f"No snapshots found in {args.dir}/snapshots")
    if args.steps:
        sel = _parse_steps_arg(args.steps, avail)
    else:
        sel = avail
        if args.start is not None or args.end is not None or args.stride is not None:
            lo = args.start if args.start is not None else avail[0]
            hi = args.end if args.end is not None else avail[-1]
            stride = args.stride if args.stride is not None else 1
            sel = [k for k in avail if lo <= k <= hi][::stride]
    meta = load_metadata(args.dir) if args.show_meta else None
    animate_from_outputs(
        args.dir,
        var=args.var,
        steps=sel,
        interval_ms=args.interval,
        fps=args.fps,
        repeat=not args.no_repeat,
        cmap=args.cmap,
        vmin=args.vmin,
        vmax=args.vmax,
        save=args.save,
        writer=args.writer,
        title_prefix=args.title_prefix,
        overlay_minmax=args.overlay_minmax,
        metadata=meta,
    )


def _add_common_style_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--cmap", default="viridis")
    p.add_argument("--vmin", type=float)
    p.add_argument("--vmax", type=float)
    p.add_argument("--show", action="store_true")
    p.add_argument("--overlay-minmax", action="store_true")


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="climate-vis",
        description="Quick CLI for visualizing climate_sim outputs.",
    )
    sub = parser.add_subparsers(dest="cmd", required=True)

    ps = sub.add_parser("show", help="Render a single snapshot")
    ps.add_argument("--dir", required=True)
    ps.add_argument("--var", default="u")
    ps.add_argument("--step", type=int)
    ps.add_argument("--title")
    _add_common_style_args(ps)
    ps.add_argument("--save")
    ps.add_argument("--show-meta", action="store_true", help="Overlay metadata on image")
    ps.set_defaults(func=cmd_show)

    pc = sub.add_parser("compare", help="Side-by-side comparison")
    pc.add_argument("--dir-a", required=True)
    pc.add_argument("--dir-b", required=True)
    pc.add_argument("--var-a", default="u")
    pc.add_argument("--var-b", default="u")
    pc.add_argument("--step", type=int, required=True)
    pc.add_argument("--title-a")
    pc.add_argument("--title-b")
    _add_common_style_args(pc)
    pc.add_argument("--no-diff", action="store_true")
    pc.add_argument("--diff-cmap", default="coolwarm")
    pc.add_argument("--diff-vlim", type=float)
    pc.add_argument("--save")
    pc.add_argument("--show-meta", action="store_true", help="Overlay metadata on images")
    pc.set_defaults(func=cmd_compare)

    pa = sub.add_parser("animate", help="Create animation")
    pa.add_argument("--dir", required=True)
    pa.add_argument("--var", default="u")
    sel = pa.add_mutually_exclusive_group()
    sel.add_argument("--steps")
    rng = pa.add_argument_group("range selection")
    rng.add_argument("--start", type=int)
    rng.add_argument("--end", type=int)
    rng.add_argument("--stride", type=int)
    pa.add_argument("--interval", type=int, default=150)
    pa.add_argument("--fps", type=int, default=12)
    pa.add_argument("--no-repeat", action="store_true")
    _add_common_style_args(pa)
    pa.add_argument("--save", required=True)
    pa.add_argument("--writer", choices=["ffmpeg", "pillow"])
    pa.add_argument("--title-prefix", default="timestep")
    pa.add_argument("--show-meta", action="store_true", help="Overlay metadata on animation")
    pa.set_defaults(func=cmd_animate)

    return parser


def main(argv: Optional[Sequence[str]] = None) -> None:
    parser = build_parser()
    args = parser.parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main()
