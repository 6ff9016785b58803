"""Packed-array dataset backend (SURVEY.md §2.4's LMDB capability, rebuilt).

The reference uses LMDB for fast random-access training reads (the lmdb
module is absent in this image). The TPU-native equivalent: pack equal-size
uint8 HR crops into one memory-mapped ``.npy`` (built offline by
``esr_tpu.scripts.create_packed_dataset``), so a training read is a single
mmap slice — no decode, no Python-object churn, ideal for feeding the
jit-fused device pipeline from a 1-core host.
"""

from __future__ import annotations

import json
import os

import numpy as np

__all__ = ["PackedDataset", "write_packed"]


def write_packed(images, out_path: str, meta: dict | None = None) -> None:
    """Pack equal-shaped HWC uint8 images into ``<out>.npy`` + ``<out>.json``."""
    arr = np.stack([np.asarray(im, dtype=np.uint8) for im in images])
    np.save(out_path + ".npy", arr)
    with open(out_path + ".json", "w") as f:
        json.dump({"n": int(arr.shape[0]), "shape": list(arr.shape[1:]), **(meta or {})}, f)


class PackedDataset:
    """Random-access crops from a packed .npy (mode='PACKED').

    Sample contract matches LRHRDataset train phase: {'HR': uint8 crop,
    'LR': None} — LR synthesis/augment happen on-device.
    """

    def __init__(self, opt: dict):
        self.opt = opt
        path = opt.get("dataroot_HR")
        if path.endswith(".npy"):
            path = path[:-4]
        if not os.path.exists(path + ".npy"):
            raise FileNotFoundError(f"packed dataset not found: {path}.npy")
        self.data = np.load(path + ".npy", mmap_mode="r")
        from esr_tpu.data.util import parse_size

        self.hr_size = parse_size(opt.get("HR_size"))  # (H, W)
        self.seed = int(opt.get("seed") or 0)
        self._epoch = 0
        self.phase = opt.get("phase", "train")

    def set_epoch(self, epoch: int) -> None:
        """See LRHRDataset.set_epoch — stateless (seed, epoch, index) draws."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return int(self.data.shape[0])

    def __getitem__(self, index: int) -> dict:
        img = self.data[index]
        h, w = img.shape[:2]
        sh, sw = self.hr_size
        if self.phase == "train" and (h != sh or w != sw):
            if h < sh or w < sw:
                # reflect-pad undersized dims like util.random_crop_pair so
                # a crop larger than the packed image in ONE dim still works
                # (ADVICE r4: h>sh with w<sw gave integers() a non-positive
                # high and raised)
                img = np.pad(
                    img,
                    ((0, max(0, sh - h)), (0, max(0, sw - w)), (0, 0)),
                    mode="reflect",
                )
                h, w = img.shape[:2]
            rng = np.random.default_rng((self.seed, self._epoch, index))
            y = int(rng.integers(0, h - sh + 1))
            x = int(rng.integers(0, w - sw + 1))
            img = img[y : y + sh, x : x + sw]
        return {
            "HR": np.asarray(img),
            "LR": None,
            "HR_path": f"packed://{index}",
            "LR_path": f"packed://{index}",
        }
