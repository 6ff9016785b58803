"""Host-side data utilities (SURVEY.md §2.5 host parts, §3.5).

Behavioral spec from the reference's ``codes/data/util.py``: recursive image
path collection, cv2 decode to float [0,1] (BGR there — converted to RGB at
this boundary, the framework is RGB/NHWC throughout), ``modcrop`` to a
multiple of scale, flip/rot augmentation. The MATLAB-bicubic resampling lives
in ``esr_tpu.ops.resize`` (single source of truth); LR generation normally
happens on-device in the fused pipeline (``esr_tpu.data.pipeline``), the
host path here exists for offline scripts and parity tests.
"""

from __future__ import annotations

import os

import numpy as np

IMG_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".ppm", ".tif", ".tiff", ".webp")

__all__ = [
    "is_image_file",
    "get_image_paths",
    "read_img",
    "read_img_uint8",
    "save_img",
    "modcrop",
    "augment",
    "random_crop_pair",
]


def is_image_file(filename: str) -> bool:
    return filename.lower().endswith(IMG_EXTENSIONS)


def get_image_paths(dataroot: str) -> list[str]:
    if dataroot is None:
        return []
    if not os.path.isdir(dataroot):
        raise FileNotFoundError(f"{dataroot} is not a directory")
    paths = []
    for root, _, files in sorted(os.walk(dataroot)):
        paths.extend(os.path.join(root, f) for f in sorted(files) if is_image_file(f))
    if not paths:
        raise FileNotFoundError(f"no images found under {dataroot}")
    return paths


def _decode_rgb(path: str) -> np.ndarray:
    """cv2 decode to HWC RGB, native dtype (uint8/uint16/float)."""
    import cv2

    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise IOError(f"failed to read image {path}")
    if img.ndim == 2:
        img = img[:, :, None]
    if img.shape[2] == 4:
        img = img[:, :, :3]
    if img.shape[2] == 3:
        img = img[:, :, ::-1]  # BGR (cv2) -> RGB (framework convention)
    return img


def read_img(path: str) -> np.ndarray:
    """Decode an image file to HWC float32 RGB in [0,1]."""
    img = _decode_rgb(path)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
    else:
        img = img.astype(np.float32)
    return np.ascontiguousarray(img)


def read_img_uint8(path: str) -> np.ndarray:
    """Decode to HWC RGB keeping uint8 when the file is 8-bit (the common
    case — PNG/JPEG training sets). The device pipeline normalizes uint8
    itself, so shipping uint8 crops costs 1/4 the host->device bytes of
    read_img's float32. Non-8-bit sources fall back to float32 [0,1]."""
    img = _decode_rgb(path)
    if img.dtype == np.uint8:
        return np.ascontiguousarray(img)
    if img.dtype == np.uint16:
        return np.ascontiguousarray(img.astype(np.float32) / 65535.0)
    return np.ascontiguousarray(img.astype(np.float32))


def save_img(img: np.ndarray, path: str) -> None:
    """Save an HWC uint8 RGB image."""
    import cv2

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    bgr = img[:, :, ::-1] if img.ndim == 3 and img.shape[2] == 3 else img
    if not cv2.imwrite(path, bgr):
        raise IOError(f"failed to write image {path}")


def modcrop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop so H and W are multiples of scale (reference eval convention)."""
    h, w = img.shape[0], img.shape[1]
    return img[: h - h % scale, : w - w % scale, ...]


def augment(imgs, hflip: bool = True, rot: bool = True, rng=None):
    """Joint random flip / rot90 of a list of HWC images (host path)."""
    rng = rng or np.random.default_rng()
    do_h = hflip and rng.random() < 0.5
    do_v = rot and rng.random() < 0.5
    do_r = rot and rng.random() < 0.5

    def one(img):
        if do_h:
            img = img[:, ::-1, :]
        if do_v:
            img = img[::-1, :, :]
        if do_r:
            img = img.transpose(1, 0, 2)
        return np.ascontiguousarray(img)

    return [one(i) for i in imgs]


def parse_size(v, default: int = 128) -> tuple[int, int]:
    """``HR_size`` as (H, W): an int means square; a 2-sequence [H, W] means
    a rectangular crop (the ``train_spatial`` tall-crop regime — note
    non-square crops require ``use_rot: false``)."""
    if v is None:
        return (default, default)
    if isinstance(v, (list, tuple)):
        if len(v) != 2:
            raise ValueError(f"HR_size must be an int or [H, W], got {v!r}")
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def random_crop_pair(hr: np.ndarray, lr: np.ndarray | None, hr_size, scale: int, rng):
    """Aligned random crop: HR to ``hr_size`` (int -> square, or (H, W)),
    LR to hr_size/scale."""
    size_h, size_w = parse_size(hr_size)
    h, w = hr.shape[:2]
    if h < size_h or w < size_w:
        # pad small images reflectively so tiny datasets still train
        ph, pw = max(0, size_h - h), max(0, size_w - w)
        hr = np.pad(hr, ((0, ph), (0, pw), (0, 0)), mode="reflect")
        if lr is not None:
            lr = np.pad(
                lr, ((0, ph // scale), (0, pw // scale), (0, 0)), mode="reflect"
            )
        h, w = hr.shape[:2]
    if lr is not None:
        lr_h, lr_w = size_h // scale, size_w // scale
        ly = int(rng.integers(0, h // scale - lr_h + 1))
        lx = int(rng.integers(0, w // scale - lr_w + 1))
        y, x = ly * scale, lx * scale
        return (
            hr[y : y + size_h, x : x + size_w],
            lr[ly : ly + lr_h, lx : lx + lr_w],
        )
    y = int(rng.integers(0, h - size_h + 1))
    x = int(rng.integers(0, w - size_w + 1))
    return hr[y : y + size_h, x : x + size_w], None
