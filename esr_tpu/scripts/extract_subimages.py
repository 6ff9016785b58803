"""Offline sub-image extraction (SURVEY.md §2.15: the reference's DIV2K
480x480 sub-image prep for fast loading).

Usage::

    python -m esr_tpu.scripts.extract_subimages --input HR_DIR --output OUT_DIR \
        --crop_size 480 --step 240 --threshold 48
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--crop_size", type=int, default=480)
    parser.add_argument("--step", type=int, default=240)
    parser.add_argument("--threshold", type=int, default=48,
                        help="discard leftover margins smaller than this")
    args = parser.parse_args(argv)

    from esr_tpu.data.util import get_image_paths, read_img, save_img
    from esr_tpu.ops.color import tensor2img

    os.makedirs(args.output, exist_ok=True)
    n_out = 0
    n_skipped = 0
    for p in get_image_paths(args.input):
        img = read_img(p)
        h, w = img.shape[:2]
        if h < args.crop_size or w < args.crop_size:
            print(f"skip {p}: {h}x{w} smaller than crop_size {args.crop_size}")
            n_skipped += 1
            continue
        base = os.path.splitext(os.path.basename(p))[0]
        ys = list(range(0, h - args.crop_size + 1, args.step))
        xs = list(range(0, w - args.crop_size + 1, args.step))
        if h - (ys[-1] + args.crop_size) > args.threshold:
            ys.append(h - args.crop_size)
        if w - (xs[-1] + args.crop_size) > args.threshold:
            xs.append(w - args.crop_size)
        idx = 0
        for y in ys:
            for x in xs:
                idx += 1
                sub = img[y : y + args.crop_size, x : x + args.crop_size]
                save_img(
                    tensor2img(sub), os.path.join(args.output, f"{base}_s{idx:03d}.png")
                )
                n_out += 1
    skipped = f" ({n_skipped} undersized inputs skipped)" if n_skipped else ""
    print(f"wrote {n_out} sub-images to {args.output}{skipped}")


if __name__ == "__main__":
    main()
