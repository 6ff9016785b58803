"""One-command framework tour on synthetic data (no datasets/weights needed).

``python -m esr_tpu.scripts.quickstart --root /tmp/esr_quickstart``

Runs the full reference workflow end-to-end at toy scale (SURVEY.md §3
call stacks, §7.5 end-to-end slice):

1. synthesizes a small HR image folder,
2. trains an explorable model (``model: srragan`` + CEM + Z map) for a few
   hundred steps via the real train CLI,
3. evaluates it via the test CLI (PSNR/SSIM/CEM residual + random-Z draws),
4. applies one exploration edit (variance up on a region) through
   :class:`esr_tpu.explore.ExplorationSession` and saves the result.

Defaults are sized for a CPU run in ~2-4 minutes; pass ``--flagship`` on a
TPU to run the real nb=23/nf=64 model instead. The option JSONs it writes
are ordinary configs — copy and edit them as a starting point.
"""

from __future__ import annotations

import argparse
import json
import os


def _write_images(root: str, n: int = 4, size: int = 96) -> str:
    from esr_tpu.data.lrhr_dataset import SyntheticDataset
    from esr_tpu.data.util import save_img
    from esr_tpu.ops.color import tensor2img

    img_dir = os.path.join(root, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    ds = SyntheticDataset({"phase": "val", "n_images": n, "image_size": size})
    for i in range(n):
        save_img(tensor2img(ds[i]["HR"]), os.path.join(img_dir, f"img{i}.png"))
    return img_dir


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--root", default="/tmp/esr_quickstart")
    p.add_argument("--niter", type=int, default=200)
    p.add_argument(
        "--flagship",
        action="store_true",
        help="full nb=23/nf=64 model (TPU-sized; the default is a toy net)",
    )
    args = p.parse_args(argv)
    root = os.path.abspath(args.root)
    os.makedirs(root, exist_ok=True)

    net_g = (
        {"which_model_G": "RRDB_net", "nf": 64, "nb": 23, "gc": 32,
         "num_latent_channels": 1, "fold": 2}
        if args.flagship
        else {"which_model_G": "RRDB_net", "nf": 8, "nb": 1, "gc": 4,
              "num_latent_channels": 1}
    )
    hr_size = 128 if args.flagship else 32
    # images must exceed the crop so training never sees reflect-padding
    img_dir = _write_images(root, size=hr_size + 64)
    print(f"[1/4] synthetic dataset at {img_dir}")
    train_opt = {
        "name": "quickstart",
        "model": "srragan",
        "scale": 4,
        "use_cem": True,
        "bf16": bool(args.flagship),
        "datasets": {
            "train": {"name": "syn", "mode": "LRHR", "dataroot_HR": img_dir,
                      "HR_size": hr_size, "batch_size": 4 if args.flagship else 2,
                      "use_shuffle": True},
            "val": {"name": "syn_val", "mode": "LRHR", "dataroot_HR": img_dir},
        },
        "path": {"root": root},
        "network_G": net_g,
        "network_D": {"which_model_D": "discriminator_vgg_128",
                      "nf": 64 if args.flagship else 8},
        "network_F": {"which_model_F": "vgg19", "feature_layer": 34},
        "train": {"lr_G": 1e-4, "lr_D": 1e-4, "niter": args.niter,
                  "val_freq": max(args.niter // 2, 1), "pixel_weight": 0.01,
                  "feature_weight": 1.0, "gan_weight": 0.005,
                  "range_weight": 1.0, "map_weight": 1.0, "manual_seed": 0},
        "logger": {"print_freq": max(args.niter // 10, 1),
                   "save_checkpoint_freq": args.niter},
    }
    train_path = os.path.join(root, "train_opt.json")
    with open(train_path, "w") as f:
        json.dump(train_opt, f, indent=2)

    from esr_tpu.train import main as train_main

    print(f"[2/4] training {args.niter} explorable GAN steps ({train_path})")
    train_main(["-opt", train_path])
    exp = os.path.join(root, "experiments", "quickstart")
    g_ckpt = os.path.join(exp, "models", "latest_G")

    test_opt = {
        "name": "quickstart_eval",
        "model": "srragan",
        "scale": 4,
        "use_cem": True,
        "is_train": False,
        "datasets": {
            "test_1": {"name": "syn_val", "mode": "LRHR", "dataroot_HR": img_dir}
        },
        "path": {"root": root, "pretrain_model_G": g_ckpt},
        "network_G": net_g,
        "num_random_Z": 2,
    }
    test_path = os.path.join(root, "test_opt.json")
    with open(test_path, "w") as f:
        json.dump(test_opt, f, indent=2)

    from esr_tpu.test import main as test_main

    print(f"[3/4] evaluating ({test_path})")
    test_main(["-opt", test_path, "--save_images"])

    print("[4/4] exploration: variance+ on a center region")
    from esr_tpu.explore.cli import build_session_from_opt

    session = build_session_from_opt(test_path, os.path.join(img_dir, "img0.png"))
    hh, ww = session.hr_shape
    session.select_rect(hh // 4, ww // 4, 3 * hh // 4, 3 * ww // 4)
    session.increase_variance()
    edited = os.path.join(root, "edited_sr.png")
    session.save_sr(edited)
    print(f"done — edited SR written to {edited}; configs under {root}")


if __name__ == "__main__":
    main()
