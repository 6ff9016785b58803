"""Offline LR/HR pair generation (SURVEY.md §2.15: the reference's
``generate_mod_LR_bic`` script capability): modcrop HR images to a multiple
of the scale and write MATLAB-bicubic LR (and optionally bicubically
re-upscaled) copies at x2/x3/x4.

Usage::

    python -m esr_tpu.scripts.generate_mod_lr_bic --input HR_DIR --output OUT_DIR --scales 2 3 4
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--scales", nargs="+", type=int, default=[4])
    parser.add_argument("--save_bic_up", action="store_true",
                        help="also save the bicubic re-upscaled LR")
    args = parser.parse_args(argv)

    from esr_tpu.data.util import get_image_paths, modcrop, read_img, save_img
    from esr_tpu.ops.color import tensor2img
    from esr_tpu.ops.resize import imresize_np

    paths = get_image_paths(args.input)
    for scale in args.scales:
        hr_dir = os.path.join(args.output, f"HR_x{scale}")
        lr_dir = os.path.join(args.output, f"LR_x{scale}")
        up_dir = os.path.join(args.output, f"Bic_x{scale}")
        for p in paths:
            img = modcrop(read_img(p), scale)
            name = os.path.basename(p)
            save_img(tensor2img(img), os.path.join(hr_dir, name))
            lr = imresize_np(img, scale=1.0 / scale)
            save_img(tensor2img(lr), os.path.join(lr_dir, name))
            if args.save_bic_up:
                save_img(
                    tensor2img(imresize_np(lr, scale=scale)),
                    os.path.join(up_dir, name),
                )
        print(f"x{scale}: {len(paths)} images -> {args.output}")


if __name__ == "__main__":
    main()
