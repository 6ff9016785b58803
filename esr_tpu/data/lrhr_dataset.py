"""Datasets (SURVEY.md §2.4).

Behavioral spec from the reference's ``codes/data/LRHR_dataset.py`` /
``LR_dataset.py``: paired LR/HR samples from image folders (LMDB is gated —
the lmdb module is absent in this environment); when LR is missing it is
generated with MATLAB-bicubic downscaling; training samples are random
aligned HR/LR crops with flip/rot augmentation.

TPU-first split of responsibilities: the host dataset only decodes and crops
uint8 pixels; LR synthesis (kernel blur + bicubic), augmentation and
normalization run on-device inside the jit-fused pipeline
(``esr_tpu.data.pipeline``). ``on_device_processing=False`` falls back to
full host-side processing (reference behavior) for parity tests.

``SyntheticDataset`` provides seeded procedural images so tests/benchmarks
run in this offline environment (no DIV2K/Set5 on disk).
"""

from __future__ import annotations

import numpy as np

from esr_tpu.data import util as data_util
from esr_tpu.ops.resize import imresize_np

__all__ = ["LRHRDataset", "LRDataset", "SyntheticDataset"]


class LRHRDataset:
    """Paired LR/HR dataset over image folders."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = int(opt.get("scale") or 4)
        self.hr_size = data_util.parse_size(opt.get("HR_size"))  # (H, W)
        self.paths_hr = data_util.get_image_paths(opt.get("dataroot_HR"))
        self.paths_lr = (
            data_util.get_image_paths(opt.get("dataroot_LR"))
            if opt.get("dataroot_LR")
            else None
        )
        if self.paths_lr and len(self.paths_lr) != len(self.paths_hr):
            raise ValueError("LR and HR datasets have different sizes")
        self.seed = int(opt.get("seed") or 0)
        self._epoch = 0
        self.on_device_processing = bool(opt.get("on_device_processing", True))
        # mirror the device pipeline's guard (pipeline.py): rot90 on a
        # rectangular crop transposes PER-SAMPLE, so a host-augmented batch
        # would mix (H,W)/(W,H) shapes and crash collation (ADVICE r4)
        if (
            self.phase == "train"
            and not self.on_device_processing
            and bool(opt.get("use_rot", True))
            and self.hr_size is not None
            and self.hr_size[0] != self.hr_size[1]
        ):
            raise ValueError(
                f"use_rot requires square train crops, got HR_size "
                f"{self.hr_size[0]}x{self.hr_size[1]} — set use_rot: false "
                "for non-square crops"
            )

    def set_epoch(self, epoch: int) -> None:
        """Crop/augment draws are a pure function of (seed, epoch, index) —
        resuming a run at epoch E replays exactly the stream the original run
        would have produced (the loader calls this each epoch)."""
        self._epoch = int(epoch)

    def _rng(self, index: int):
        return np.random.default_rng((self.seed, self._epoch, index))

    def __len__(self) -> int:
        return len(self.paths_hr)

    def __getitem__(self, index: int) -> dict:
        hr_path = self.paths_hr[index]
        lr_path = self.paths_lr[index] if self.paths_lr else hr_path

        if self.phase == "train":
            rng = self._rng(index)
            if self.on_device_processing:
                # uint8 decode: the device pipeline normalizes itself, so
                # uint8 crops cost 1/4 the H2D bytes of float32
                hr = data_util.read_img_uint8(hr_path)
                lr = data_util.read_img_uint8(lr_path) if self.paths_lr else None
                hr, lr = data_util.random_crop_pair(hr, lr, self.hr_size, self.scale, rng)
                # device pipeline does LR synthesis + augment + normalize
                return {"HR": hr, "LR": lr, "HR_path": hr_path, "LR_path": lr_path}
            hr = data_util.read_img(hr_path)
            lr = data_util.read_img(lr_path) if self.paths_lr else None
            hr, lr = data_util.random_crop_pair(hr, lr, self.hr_size, self.scale, rng)
            if lr is None:
                lr = imresize_np(hr, scale=1.0 / self.scale)
            hr_a, lr_a = data_util.augment(
                [hr, lr], self.opt.get("use_flip", True), self.opt.get("use_rot", True), rng
            )
            return {"HR": hr_a, "LR": lr_a, "HR_path": hr_path, "LR_path": lr_path}

        hr = data_util.read_img(hr_path)
        lr = data_util.read_img(lr_path) if self.paths_lr else None
        hr = data_util.modcrop(hr, self.scale)
        if lr is None:
            lr = imresize_np(hr, scale=1.0 / self.scale)
        return {"HR": hr, "LR": lr, "HR_path": hr_path, "LR_path": lr_path}


class LRDataset:
    """LR-only dataset (blind test: no ground truth)."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.paths_lr = data_util.get_image_paths(opt.get("dataroot_LR"))

    def __len__(self) -> int:
        return len(self.paths_lr)

    def __getitem__(self, index: int) -> dict:
        lr_path = self.paths_lr[index]
        return {"LR": data_util.read_img(lr_path), "LR_path": lr_path}


class SyntheticDataset:
    """Seeded procedural HR images (gradients + gaussian blobs + texture) —
    offline stand-in for DIV2K/Set5 with the same sample dict contract."""

    def __init__(self, opt: dict):
        self.opt = opt
        self.phase = opt.get("phase", "train")
        self.scale = int(opt.get("scale") or 4)
        self.hr_size = data_util.parse_size(opt.get("HR_size"))  # (H, W)
        self.n = int(opt.get("n_images") or 16)
        self.image_size = int(opt.get("image_size") or max(*self.hr_size, 192))
        self.seed = int(opt.get("seed") or 0)
        self._epoch = 0
        self._img_cache: dict[int, np.ndarray] = {}

    def set_epoch(self, epoch: int) -> None:
        """See LRHRDataset.set_epoch — stateless (seed, epoch, index) draws."""
        self._epoch = int(epoch)

    def __len__(self) -> int:
        return self.n

    def _make_image(self, index: int) -> np.ndarray:
        # deterministic per index (epoch variation comes from the crop /
        # augment draws in __getitem__, never from here), so memoize: the
        # procedural synth is ~20-40 ms/image and an UNCACHED train loader
        # is host-bound at ~4.5 steps/s on the 1-core host vs the ~19
        # steps/s device rate (measured r5 soak) — a 64-image set costs
        # ~17 MB cached
        if index in self._img_cache:
            return self._img_cache[index]
        rng = np.random.default_rng(1000 + index)
        s = self.image_size
        yy, xx = np.mgrid[0:s, 0:s].astype(np.float32) / s
        img = np.stack(
            [
                0.5 + 0.5 * np.sin(2 * np.pi * (ax * xx + ay * yy + ph))
                for ax, ay, ph in rng.uniform(0, 3, size=(3, 3))
            ],
            axis=-1,
        )
        for _ in range(6):
            cy, cx = rng.uniform(0.1, 0.9, 2)
            sig = rng.uniform(0.02, 0.15)
            blob = np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sig**2))
            img += blob[..., None] * rng.uniform(-0.5, 0.5, 3)
        img += rng.normal(0, 0.02, img.shape)
        img = np.clip(img, 0, 1).astype(np.float32)
        self._img_cache[index] = img
        return img

    def __getitem__(self, index: int) -> dict:
        hr = self._make_image(index)
        path = f"synthetic://{index}"
        if self.phase == "train":
            rng = np.random.default_rng((self.seed, self._epoch, index))
            hr, _ = data_util.random_crop_pair(hr, None, self.hr_size, self.scale, rng)
            # uint8 crop (device pipeline's contract: 1/4 the H2D bytes);
            # synthetic sources are float so this quantizes once at the
            # same 8-bit grid a real PNG training set lives on
            hr = (hr * 255.0).round().astype(np.uint8)
            return {"HR": hr, "LR": None, "HR_path": path, "LR_path": path}
        hr = data_util.modcrop(hr, self.scale)
        lr = imresize_np(hr, scale=1.0 / self.scale)
        return {"HR": hr, "LR": lr, "HR_path": path, "LR_path": path}
