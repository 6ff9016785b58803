"""PSNR / SSIM with the reference's exact evaluation semantics.

Behavioral spec (SURVEY.md §2.14, §5.5): the reference's ``codes/utils/util.py
:: calculate_psnr / calculate_ssim`` operate on uint8-domain [0,255] images
(optionally Y-channel after bgr2ycbcr, with a border crop of ``scale``
pixels), PSNR = 20*log10(255/sqrt(MSE)) in float64, SSIM = gaussian-windowed
(11x11, sigma 1.5) on the 'valid' region with C1=(0.01*255)^2,
C2=(0.03*255)^2. These definitions gate the PSNR-parity target, so the numpy
versions here reproduce them exactly; ``psnr_jax``/``ssim_jax`` are jit-able
on-device twins (with optional uint8 quantization to match the host numbers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "calculate_psnr",
    "calculate_ssim",
    "psnr_jax",
    "ssim_jax",
    "crop_border",
]


def crop_border(img: np.ndarray, border: int) -> np.ndarray:
    """Crop ``border`` pixels from each spatial edge (reference eval crops scale)."""
    if border == 0:
        return img
    return img[border:-border, border:-border, ...]


def calculate_psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR between two [0,255]-domain images (any shape), float64 math."""
    img1 = np.asarray(img1, dtype=np.float64)
    img2 = np.asarray(img2, dtype=np.float64)
    mse = np.mean((img1 - img2) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0 / np.sqrt(mse)))


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - (size - 1) / 2.0) ** 2) / (2.0 * sigma**2))
    g = g / g.sum()
    return np.outer(g, g)


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    img1 = img1.astype(np.float64)
    img2 = img2.astype(np.float64)
    window = _gaussian_window()

    from scipy.signal import correlate2d

    def filt(x):
        return correlate2d(x, window, mode="valid")

    mu1 = filt(img1)
    mu2 = filt(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = filt(img1**2) - mu1_sq
    sigma2_sq = filt(img2**2) - mu2_sq
    sigma12 = filt(img1 * img2) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return float(ssim_map.mean())


def calculate_ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """SSIM between two [0,255]-domain HxW or HxWxC images (channel-averaged)."""
    img1 = np.asarray(img1)
    img2 = np.asarray(img2)
    if img1.shape != img2.shape:
        raise ValueError("input images must have the same dimensions")
    if img1.ndim == 2:
        return _ssim_single(img1, img2)
    if img1.ndim == 3:
        if img1.shape[2] == 1:
            return _ssim_single(img1[..., 0], img2[..., 0])
        return float(
            np.mean([_ssim_single(img1[..., c], img2[..., c]) for c in range(img1.shape[2])])
        )
    raise ValueError("wrong input image dimensions")


# --------------------------------------------------------------------------
# On-device twins
# --------------------------------------------------------------------------


def _to_uint8_domain(x: jax.Array, quantize: bool) -> jax.Array:
    x = jnp.clip(x.astype(jnp.float32), 0.0, 1.0) * 255.0
    if quantize:
        x = jnp.round(x)
    return x


def psnr_jax(
    img1: jax.Array,
    img2: jax.Array,
    border: int = 0,
    quantize: bool = True,
) -> jax.Array:
    """On-device PSNR for [0,1] float images, reproducing the uint8 semantics.

    With ``quantize=True`` matches :func:`calculate_psnr` on
    ``tensor2img``-converted arrays to float32 precision.
    """
    if border:
        img1 = img1[..., border:-border, border:-border, :]
        img2 = img2[..., border:-border, border:-border, :]
    a = _to_uint8_domain(img1, quantize)
    b = _to_uint8_domain(img2, quantize)
    mse = jnp.mean((a - b) ** 2)
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def ssim_jax(
    img1: jax.Array,
    img2: jax.Array,
    border: int = 0,
    quantize: bool = True,
) -> jax.Array:
    """On-device SSIM (gaussian 11x11 sigma 1.5) for [0,1] float NHWC/HWC images."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    if border:
        img1 = img1[:, border:-border, border:-border, :]
        img2 = img2[:, border:-border, border:-border, :]
    # Work in [0,1] (SSIM is scale-invariant) for float32 conditioning on TPU.
    a = _to_uint8_domain(img1, quantize) / 255.0
    b = _to_uint8_domain(img2, quantize) / 255.0
    c = a.shape[-1]
    window = jnp.asarray(_gaussian_window(), dtype=jnp.float32)
    # Depthwise valid convolution: kernel HWIO with feature_group_count=C.
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c))

    def filt(x):
        return jax.lax.conv_general_dilated(
            x,
            kern,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST,
        )

    c1 = 0.01**2
    c2 = 0.03**2
    mu1, mu2 = filt(a), filt(b)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = filt(a * a) - mu1_sq
    sigma2_sq = filt(b * b) - mu2_sq
    sigma12 = filt(a * b) - mu1_mu2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
