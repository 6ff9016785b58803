"""Interactive exploration CLI (SURVEY.md §2.16 — the editor workflow,
terminal edition; the Qt front-end in ``esr_tpu.explore.gui`` wraps the same
session API and needs PyQt).

Usage::

    python -m esr_tpu.explore.cli -opt OPTIONS.json --lr image.png \
        [--estimate_kernel [ITERS]]   # blind SR: KernelGAN-estimate the
                                      # kernel from image.png, CEM under it

Commands (one per line)::

    select y0 x0 y1 x1        # HR-space rectangle
    polygon y x y x ...       # HR-space polygon selection (>=3 vertices)
    clear                     # clear the selection
    variance +|-              # increase / decrease local variance
    realism +|-               # push D realism score up / down (needs a D —
                              # loaded from path.pretrain_model_D when set)
    dscore                    # print the region's current D realism score
    brightness LEVEL          # 0..1 target mean
    smooth                    # TV smoothing
    periodicity PY PX         # encourage periodicity (pixels; 0 = off)
    imprint PATH              # L1-imprint an image file over the region
    text WORDS...             # imprint rendered text (graffiti) in-region
    histogram PATH            # transfer an image's intensity distribution
    alternatives K            # propose K diverse candidates (none applied)
    pick I                    # apply proposed candidate I
    steps N                   # Z-search steps per tool run (search strength)
    zmax R                    # adaptive tools' z-range escalation ceiling
                              # (0 = stay inside the trained latent box)
    undo / redo / reset       # Z history ops
    zmap PATH                 # save a Z-map visualization png
    save PATH                 # write current SR png
    savez PATH                # write session state (npz)
    loadz PATH                # load session state
    quit
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def build_session_from_opt(opt_path: str, lr_path: str, estimate_kernel_iters=None):
    import jax.numpy as jnp

    from esr_tpu import options as options_mod
    from esr_tpu.data.util import read_img
    from esr_tpu.models import create_model

    opt = options_mod.parse(opt_path, is_train=False)
    lr_host = read_img(lr_path)
    if estimate_kernel_iters:
        # blind SR in one flag: estimate the downsampling kernel from the LR
        # image itself (KernelGAN-style, cem/kernelgan.py) and drive CEM +
        # exploration under it instead of the bicubic assumption
        from esr_tpu.cem.kernelgan import conf_for_image, estimate_kernel

        conf = conf_for_image(
            lr_host.shape, int(opt.get("scale") or 4), int(estimate_kernel_iters)
        )
        print(
            f"estimating kernel from {lr_path} ({conf.iters} iters, "
            f"g_input {conf.g_input})...",
            flush=True,
        )
        opt["kernel"], _ = estimate_kernel(lr_host, conf)
        if not opt.get("use_cem"):
            print(
                "note: use_cem is false — the estimated kernel affects nothing; "
                "set use_cem: true for consistency under it",
                flush=True,
            )
    model = create_model(opt)
    lr_img = lr_host[None]

    def forward(params, lr, z):
        raw = model.g_module.apply({"params": params}, lr, z)
        if model.cem is not None:
            raw = model.cem.project(raw, lr)
        return raw

    from esr_tpu.explore.session import ExplorationSession

    state = getattr(model, "g_state", None) or model.state
    sess = ExplorationSession(
        forward,
        state.params,
        lr_img,
        num_latent_channels=model.nz or 1,
        scale=int(opt.get("scale") or 4),
    )

    # attach a trained discriminator for the realism tool when available:
    # in eval mode the model doesn't build a D, so load it directly from the
    # pretrain_model_D artifact ({'params', 'batch_stats'})
    d_state = getattr(model, "d_state", None)
    net_d = opt.get("network_D") or {}
    norm_d = "batch" if (net_d.get("norm_type") or "batch") == "batch" else "none"
    fallback_nf = int(net_d.get("nf") or 64)
    if d_state is not None:
        sess.set_discriminator(
            {"params": d_state.params, "batch_stats": d_state.batch_stats},
            nf=infer_d_nf(d_state.params, fallback_nf),
            norm=norm_d,
        )
    elif opt["path"].get("pretrain_model_D"):
        # load the saved {'params','batch_stats'} artifact as-is (no shape
        # template: the D's Dense head is sized by the training HR crop, and
        # adversarial_objective infers that size from the checkpoint)
        d_vars = model.load_network(opt["path"]["pretrain_model_D"])
        sess.set_discriminator(
            d_vars, nf=infer_d_nf(d_vars.get("params"), fallback_nf), norm=norm_d
        )
    return sess


def infer_d_nf(params, default: int = 64) -> int:
    """D width from the checkpoint's first conv (kernel HWIO: (3,3,3,nf)) so
    an eval opt without a ``network_D`` block — or with a stale ``nf`` —
    still attaches the D it was actually trained with, instead of a flax
    shape error (the Dense head is likewise checkpoint-inferred by
    ``adversarial_objective``)."""
    try:
        return int(params["conv0_0"]["kernel"].shape[-1])
    except (KeyError, AttributeError, TypeError, IndexError):
        return int(default)


def _get_vm(sess):
    """One EditorViewModel per session — the CLI and Qt GUI drive the same
    tested editor surface (esr_tpu.explore.viewmodel)."""
    from esr_tpu.explore.viewmodel import EditorViewModel

    if isinstance(sess, EditorViewModel):
        return sess
    if not hasattr(sess, "_cli_vm"):
        sess._cli_vm = EditorViewModel(sess)
    return sess._cli_vm


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
        return _dispatch(_get_vm(sess), cmd, args)
    except (IndexError, ValueError, FileNotFoundError) as e:
        return f"bad arguments for '{cmd}' ({e}); see module docstring for usage"


def _dispatch(vm, cmd: str, args: list[str]) -> str:
    sess = vm.session
    if cmd == "select":
        y0, x0, y1, x1 = map(int, args)
        sess.select_rect(y0, x0, y1, x1)
        return f"selected rect {(y0, x0, y1, x1)}"
    if cmd == "polygon":
        coords = list(map(int, args))
        if len(coords) < 6 or len(coords) % 2:
            raise ValueError("need >=3 (y, x) vertex pairs")
        vm.set_selection_mode("polygon")
        for y, x in zip(coords[::2], coords[1::2]):
            vm.pointer_down(y, x)
        return vm.finish_polygon()
    if cmd == "clear":
        return vm.clear_selection()
    if cmd == "steps":
        return vm.set_search_steps(int(args[0]))
    if cmd == "zmax":
        return vm.set_z_range_max(float(args[0]))
    if cmd == "variance":
        if not args or args[0] not in ("+", "-"):
            raise ValueError("usage: variance +|-")
        return vm.variance(+1 if args[0] == "+" else -1)
    if cmd == "realism":
        if not args or args[0] not in ("+", "-"):
            raise ValueError("usage: realism +|-")
        return vm.realism(+1 if args[0] == "+" else -1)
    if cmd == "dscore":
        return f"D realism score: {sess.d_score():+.4f}"
    if cmd == "brightness":
        return vm.brightness(float(args[0]))
    if cmd == "smooth":
        return vm.smooth()
    if cmd == "periodicity":
        return vm.periodicity(float(args[0]), float(args[1]))
    if cmd == "imprint":
        from esr_tpu.data.util import read_img

        return vm.imprint_image(read_img(args[0]).astype(np.float32))
    if cmd == "text":
        if not args:
            raise ValueError("need text to imprint")
        return vm.imprint_text(" ".join(args))
    if cmd == "histogram":
        from esr_tpu.data.util import read_img

        return vm.match_histogram(read_img(args[0]))
    if cmd == "alternatives":
        return vm.generate_alternatives(k=int(args[0]) if args else 3)
    if cmd == "pick":
        return vm.pick_alternative(int(args[0]))
    if cmd == "undo":
        return vm.undo()
    if cmd == "redo":
        return vm.redo()
    if cmd == "reset":
        return vm.reset_region()
    if cmd == "zmap":
        from esr_tpu.data.util import save_img

        save_img(vm.zmap_image(), args[0])
        return f"z-map saved {args[0]}"
    if cmd == "save":
        vm.save_image(args[0])
        return f"saved {args[0]}"
    if cmd == "savez":
        vm.save_session(args[0])
        return f"state saved {args[0]}"
    if cmd == "loadz":
        return vm.load_session(args[0])
    return f"unknown command: {cmd}"


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-opt", required=True)
    parser.add_argument("--lr", required=True, help="LR input image path")
    parser.add_argument(
        "--estimate_kernel",
        nargs="?",
        const=2000,
        type=int,
        default=None,
        help="blind SR: estimate the downsampling kernel from the LR image "
        "(KernelGAN-style) and run CEM/exploration under it; optional value "
        "sets the iteration count (default 2000)",
    )
    args = parser.parse_args(argv)
    sess = build_session_from_opt(args.opt, args.lr, args.estimate_kernel)
    print("explorable-SR editor; 'quit' to exit", flush=True)
    for line in sys.stdin:
        msg = run_command(sess, line)
        if not msg:
            break
        print(msg, flush=True)


if __name__ == "__main__":
    main()
