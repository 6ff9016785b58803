"""Estimate the downsampling kernel of an LR image (KernelGAN-style).

Closes the blind-SR loop in-framework (the reference consumes KernelGAN
``.mat`` kernels but ships no estimator — SURVEY.md §2.10a)::

    python -m esr_tpu.scripts.estimate_kernel --lr real_lr.png --scale 4 \
        --iters 2000 --out kernel_x4.npy

then point any train/test JSON at it::

    "kernel": "kernel_x4.npy"

and the whole stack — LR synthesis, CEM projection, exploration — runs
under the estimated kernel (see tests/test_e2e.py kernel-opt coverage).
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lr", required=True, help="LR image (png/jpg)")
    parser.add_argument("--scale", type=int, default=4)
    parser.add_argument("--iters", type=int, default=2000)
    parser.add_argument("--g_input", type=int, default=64, help="G crop size (LR px)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--out", required=True, help="output .npy kernel path")
    parser.add_argument(
        "--watchdog",
        type=float,
        default=None,
        metavar="SECONDS",
        help="relay-stall watchdog floor (default: on, 900 s; 0 disables) — "
        "2000 iters on chip is a long multi-dispatch run, the measured "
        "wedge regime (utils/watchdog.py)",
    )
    args = parser.parse_args(argv)

    import numpy as np

    from esr_tpu.cem.kernelgan import KernelGANConf, estimate_kernel
    from esr_tpu.data.util import read_img
    from esr_tpu.utils.watchdog import arm_from_opt

    wd = arm_from_opt(args.watchdog, label="estimate_kernel")

    img = read_img(args.lr)
    conf = KernelGANConf(
        scale=args.scale, iters=args.iters, g_input=args.g_input, seed=args.seed
    )

    def progress(done, total, metrics):
        print(
            f"[{done}/{total}] l_g {metrics['l_g']:.4f} l_d {metrics['l_d']:.4f} "
            f"reg {metrics['reg']:.4f}",
            flush=True,
        )
        if wd is not None:
            wd.beat()

    kernel, _ = estimate_kernel(img, conf, progress=progress)
    if wd is not None:
        wd.stop()
    np.save(args.out, kernel)
    com = np.unravel_index(np.argmax(kernel), kernel.shape)
    print(
        f"saved {kernel.shape[0]}x{kernel.shape[1]} kernel to {args.out} "
        f"(peak at {com}, sum {kernel.sum():.6f}) — use it as opt['kernel']"
    )


if __name__ == "__main__":
    main()
