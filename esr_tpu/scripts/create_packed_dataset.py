"""Build a packed training dataset (SURVEY.md §2.15's LMDB-creation script
capability, TPU-native: one mmap-able uint8 array instead of LMDB).

Usage::

    python -m esr_tpu.scripts.create_packed_dataset --input SUBIMAGES_DIR \
        --output datasets/div2k_pack --size 480
"""

from __future__ import annotations

import argparse


def main(argv=None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True)
    parser.add_argument("--output", required=True)
    parser.add_argument("--size", type=int, default=480,
                        help="crop/pad every image to size x size")
    args = parser.parse_args(argv)

    import numpy as np

    from esr_tpu.data.packed import write_packed
    from esr_tpu.data.util import get_image_paths, read_img

    imgs = []
    for p in get_image_paths(args.input):
        img = (read_img(p) * 255).round().astype(np.uint8)
        h, w = img.shape[:2]
        s = args.size
        if h < s or w < s:
            img = np.pad(img, ((0, max(0, s - h)), (0, max(0, s - w)), (0, 0)), mode="reflect")
        imgs.append(img[:s, :s])
    write_packed(imgs, args.output, meta={"source": args.input})
    print(f"packed {len(imgs)} images ({args.size}px) -> {args.output}.npy")


if __name__ == "__main__":
    main()
