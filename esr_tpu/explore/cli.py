"""Interactive exploration CLI (SURVEY.md §2.16 — the editor workflow,
terminal edition; the Qt front-end in ``esr_tpu.explore.gui`` wraps the same
session API and needs PyQt).

Usage::

    python -m esr_tpu.explore.cli -opt OPTIONS.json --lr image.png

Commands (one per line)::

    select y0 x0 y1 x1        # HR-space rectangle
    variance +|-              # increase / decrease local variance
    brightness LEVEL          # 0..1 target mean
    smooth                    # TV smoothing
    periodicity PY PX         # encourage periodicity (pixels; 0 = off)
    imprint PATH              # L1-imprint an image file over the region
    alternatives K            # K diverse consistent alternatives
    undo / redo / reset       # Z history ops
    save PATH                 # write current SR png
    savez PATH                # write session state (npz)
    quit
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_session_from_opt(opt_path: str, lr_path: str):
    import jax.numpy as jnp

    from esr_tpu import options as options_mod
    from esr_tpu.data.util import read_img
    from esr_tpu.models import create_model

    opt = options_mod.parse(opt_path, is_train=False)
    model = create_model(opt)
    lr_img = read_img(lr_path)[None]

    def forward(params, lr, z):
        raw = model.g_module.apply({"params": params}, lr, z)
        if model.cem is not None:
            raw = model.cem.project(raw, lr)
        return raw

    from esr_tpu.explore.session import ExplorationSession

    state = getattr(model, "g_state", None) or model.state
    return ExplorationSession(
        forward,
        state.params,
        lr_img,
        num_latent_channels=model.nz or 1,
        scale=int(opt.get("scale") or 4),
    )


def run_command(sess, line: str) -> str:
    """Execute one editor command; returns a status string ('' = quit).
    Malformed arguments report usage instead of raising."""
    parts = line.strip().split()
    if not parts:
        return "noop"
    cmd, args = parts[0].lower(), parts[1:]
    if cmd == "quit":
        return ""
    try:
        return _dispatch(sess, cmd, args)
    except (IndexError, ValueError, FileNotFoundError) as e:
        return f"bad arguments for '{cmd}' ({e}); see module docstring for usage"


def _dispatch(sess, cmd: str, args: list[str]) -> str:
    if cmd == "select":
        y0, x0, y1, x1 = map(int, args)
        sess.select_rect(y0, x0, y1, x1)
        return f"selected rect {(y0, x0, y1, x1)}"
    if cmd == "variance":
        losses = sess.increase_variance() if args[0] == "+" else sess.decrease_variance()
        return f"variance {args[0]}: loss {losses[0]:.4f} -> {losses[-1]:.4f}"
    if cmd == "brightness":
        losses = sess.brightness(float(args[0]))
        return f"brightness: loss {losses[0]:.4f} -> {losses[-1]:.4f}"
    if cmd == "smooth":
        losses = sess.smooth()
        return f"smooth: loss {losses[0]:.4f} -> {losses[-1]:.4f}"
    if cmd == "periodicity":
        losses = sess.periodicity(float(args[0]), float(args[1]))
        return f"periodicity: loss {losses[0]:.4f} -> {losses[-1]:.4f}"
    if cmd == "imprint":
        from esr_tpu.data.util import read_img

        target = read_img(args[0])
        h, w = sess.hr_shape
        if target.shape[:2] != (h, w):
            from esr_tpu.ops.resize import imresize_np

            target = imresize_np(target, out_shape=(h, w))
        losses = sess.imprint(target.astype(np.float32))
        return f"imprint: loss {losses[0]:.4f} -> {losses[-1]:.4f}"
    if cmd == "alternatives":
        outs = sess.random_alternatives(k=int(args[0]) if args else 3)
        return f"generated {len(outs)} alternatives"
    if cmd == "undo":
        sess.undo()
        return "undone"
    if cmd == "redo":
        sess.redo()
        return "redone"
    if cmd == "reset":
        sess.reset_region_z()
        return "region Z reset"
    if cmd == "save":
        sess.save_sr(args[0])
        return f"saved {args[0]}"
    if cmd == "savez":
        sess.save_state(args[0])
        return f"state saved {args[0]}"
    return f"unknown command: {cmd}"


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--lr", required=True, help="LR input image path")
    args = parser.parse_args(argv)
    sess = build_session_from_opt(args.opt, args.lr)
    print("explorable-SR editor; 'quit' to exit", flush=True)
    for line in sys.stdin:
        msg = run_command(sess, line)
        if not msg:
            break
        print(msg, flush=True)


if __name__ == "__main__":
    main()
