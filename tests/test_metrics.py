"""PSNR/SSIM/color parity tests (SURVEY.md §7.2).

Host (numpy) versions lock the reference's uint8-domain semantics; on-device
twins are checked against the host versions.
"""

import numpy as np
import jax.numpy as jnp

from esr_tpu.ops.color import bgr2ycbcr, img2tensor, rgb2ycbcr, tensor2img, ycbcr2rgb
from esr_tpu.ops.metrics import (
    calculate_psnr,
    calculate_ssim,
    crop_border,
    psnr_jax,
    ssim_jax,
)


def test_psnr_known_value():
    a = np.zeros((8, 8), dtype=np.float64)
    b = np.full((8, 8), 255.0)
    assert abs(calculate_psnr(a, b) - 0.0) < 1e-9
    b2 = np.full((8, 8), 1.0)
    # mse=1 -> psnr = 20 log10(255) = 48.1308...
    assert abs(calculate_psnr(a, b2) - 48.13080361) < 1e-6
    assert calculate_psnr(a, a) == float("inf")


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    img = (rng.random((32, 32)) * 255).round()
    assert abs(calculate_ssim(img, img) - 1.0) < 1e-12
    noisy = np.clip(img + rng.normal(0, 20, img.shape), 0, 255)
    s = calculate_ssim(img, noisy)
    assert 0.0 < s < 1.0


def test_ssim_multichannel_is_channel_mean():
    rng = np.random.default_rng(1)
    a = (rng.random((24, 24, 3)) * 255).round()
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
    per = [calculate_ssim(a[..., c], b[..., c]) for c in range(3)]
    assert abs(calculate_ssim(a, b) - np.mean(per)) < 1e-12


def test_jax_psnr_matches_numpy_uint8_path():
    rng = np.random.default_rng(2)
    x = rng.random((16, 16, 3)).astype(np.float32)
    y = rng.random((16, 16, 3)).astype(np.float32)
    xu = tensor2img(x)
    yu = tensor2img(y)
    ref = calculate_psnr(xu.astype(np.float64), yu.astype(np.float64))
    got = float(psnr_jax(jnp.asarray(x), jnp.asarray(y)))
    assert abs(ref - got) < 1e-3


def test_jax_ssim_matches_numpy():
    rng = np.random.default_rng(3)
    x = rng.random((32, 32, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    ref = calculate_ssim(tensor2img(x).astype(np.float64), tensor2img(y).astype(np.float64))
    got = float(ssim_jax(jnp.asarray(x), jnp.asarray(y)))
    # float32 conv accumulation limits on-device agreement; host numpy version
    # is the parity gate (SURVEY.md §5.5)
    assert abs(ref - got) < 5e-4


def test_crop_border():
    img = np.arange(64).reshape(8, 8)
    assert crop_border(img, 2).shape == (4, 4)
    assert crop_border(img, 0).shape == (8, 8)


def test_ycbcr_roundtrip_and_y_values():
    rng = np.random.default_rng(4)
    img = rng.random((8, 8, 3)).astype(np.float32)
    full = rgb2ycbcr(img, only_y=False)
    back = ycbcr2rgb(full)
    np.testing.assert_allclose(back, img, atol=1e-4)
    # gray: R=G=B=v -> Y = v*(65.481+128.553+24.966)/255 + 16/255
    v = 0.5
    gray = np.full((4, 4, 3), v, dtype=np.float32)
    y = rgb2ycbcr(gray, only_y=True)
    expected = (v * (65.481 + 128.553 + 24.966) + 16.0) / 255.0
    np.testing.assert_allclose(y, expected, atol=1e-5)
    # bgr2ycbcr(img[::-1 channels]) == rgb2ycbcr(img)
    np.testing.assert_allclose(
        bgr2ycbcr(img[..., ::-1], only_y=True), rgb2ycbcr(img, only_y=True), atol=1e-6
    )


def test_tensor2img_rounding():
    x = np.array([[[0.0039215]]], dtype=np.float32)  # ~1/255 -> rounds to 1
    assert tensor2img(x)[0, 0] == 1
    x = np.array([[[-0.5]], [[1.5]]], dtype=np.float32)
    out = tensor2img(x)
    assert out.min() == 0 and out.max() == 255


def test_img2tensor():
    u = (np.arange(12, dtype=np.uint8)).reshape(2, 2, 3)
    t = img2tensor(u)
    assert t.dtype == np.float32 and t.max() <= 1.0
    g = np.zeros((4, 4), dtype=np.float32)
    assert img2tensor(g).shape == (4, 4, 1)


def test_to_uint8_jax_matches_tensor2img():
    """Device-side uint8 conversion (to_uint8_jax) must be bit-identical to
    the host tensor2img it replaces in the eval fetch path (VERDICT r2
    weak #9): same clip, same round-half-to-even, same cast."""
    from esr_tpu.ops.color import to_uint8_jax

    rng = np.random.default_rng(7)
    x = rng.uniform(-0.3, 1.3, (33, 17, 3)).astype(np.float32)
    # seed exact rounding boundaries (k+0.5)/255 to pin half-to-even parity
    x.ravel()[:256] = (np.arange(256) + 0.5) / 255.0
    np.testing.assert_array_equal(np.asarray(to_uint8_jax(x)), tensor2img(x))
    # custom min_max window
    np.testing.assert_array_equal(
        np.asarray(to_uint8_jax(x, min_max=(-1.0, 1.0))),
        tensor2img(x, min_max=(-1.0, 1.0)),
    )
