"""Loss library (SURVEY.md §2.9).

Behavioral spec from the reference's ``codes/models/modules/loss.py`` plus the
fork's explorable-training additions:

- ``gan_loss``: vanilla (BCE-with-logits) / lsgan (MSE) / wgan-gp switch; the
  trainer applies it *relativistically* (ESRGAN RaGAN: loss on
  ``D(x) - mean(D(y))``).
- ``gradient_penalty``: WGAN-GP penalty (jax.grad-based, pure).
- ``range_loss``: penalizes pixels outside [0,1] — required because the
  CEM-wrapped generator output is unbounded (SURVEY.md §2.10a).
- ``map_loss``: the fork's structure/"filter" loss tying local output
  statistics to the latent Z channels so Z becomes a controllable knob.
  Exact reference formulation unavailable (empty mount — SURVEY.md
  provenance warning); this implementation ties the local-std delta between
  SR and HR to the window-averaged Z, which yields the monotone
  variance-control the exploration tools rely on — demonstrated empirically
  on a trained model in tests/test_z_control.py (Z sweep monotonically
  sweeps output local std; the GUI variance tool moves it both directions).
  TODO(verify-vs-reference when the mount appears).
- ``perceptual_l1``: ESRGAN's L1 feature-space loss helper.

All pure functions of arrays -> scalar, jit/grad-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "gan_loss",
    "ragan_d_loss",
    "ragan_g_loss",
    "gradient_penalty",
    "range_loss",
    "map_loss",
    "local_std",
    "charbonnier",
    "pixel_loss",
    "perceptual_l1",
    "tv_loss",
]


def _bce_logits(logits, target):
    # target in {0., 1.}
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def gan_loss(logits: jax.Array, target_is_real: bool, gan_type: str = "vanilla"):
    if gan_type == "vanilla":
        return _bce_logits(logits, jnp.float32(1.0 if target_is_real else 0.0))
    if gan_type == "lsgan":
        target = jnp.float32(1.0 if target_is_real else 0.0)
        return jnp.mean((logits - target) ** 2)
    if gan_type in ("wgan-gp", "wgan"):
        return -jnp.mean(logits) if target_is_real else jnp.mean(logits)
    raise ValueError(f"unknown gan_type {gan_type}")


def ragan_d_loss(
    d_real: jax.Array, d_fake: jax.Array, gan_type: str = "vanilla", relativistic: bool = True
):
    """Discriminator loss: relativistic-average (ESRGAN recipe) by default,
    standard GAN (the reference's SRGAN_model variant) otherwise."""
    if not relativistic:
        return (gan_loss(d_real, True, gan_type) + gan_loss(d_fake, False, gan_type)) / 2.0
    lr = gan_loss(d_real - jnp.mean(d_fake), True, gan_type)
    lf = gan_loss(d_fake - jnp.mean(d_real), False, gan_type)
    return (lr + lf) / 2.0


def ragan_g_loss(
    d_real: jax.Array, d_fake: jax.Array, gan_type: str = "vanilla", relativistic: bool = True
):
    """Generator adversarial loss: relativistic-average by default, standard
    GAN otherwise (d_real unused in the standard form)."""
    if not relativistic:
        return gan_loss(d_fake, True, gan_type)
    lr = gan_loss(d_real - jnp.mean(d_fake), False, gan_type)
    lf = gan_loss(d_fake - jnp.mean(d_real), True, gan_type)
    return (lr + lf) / 2.0


def gradient_penalty(d_apply, params, real: jax.Array, fake: jax.Array, rng):
    """WGAN-GP penalty at random interpolates; ``d_apply(params, x)->logits``."""
    eps = jax.random.uniform(rng, (real.shape[0], 1, 1, 1), dtype=real.dtype)
    interp = eps * real + (1.0 - eps) * fake

    def d_sum(x):
        return jnp.sum(d_apply(params, x))

    grads = jax.grad(d_sum)(interp)
    gnorm = jnp.sqrt(jnp.sum(grads**2, axis=(1, 2, 3)) + 1e-12)
    return jnp.mean((gnorm - 1.0) ** 2)


def range_loss(x: jax.Array, lo: float = 0.0, hi: float = 1.0):
    """Mean overshoot outside [lo, hi] (reference fork's CreateRangeLoss)."""
    return jnp.mean(jnp.maximum(x - hi, 0.0) + jnp.maximum(lo - x, 0.0))


def _box_window(size: int):
    w = np.ones((size, size), dtype=np.float32) / (size * size)
    return jnp.asarray(w)


def _depthwise(x: jax.Array, window: jax.Array):
    c = x.shape[-1]
    kern = jnp.tile(window[:, :, None, None], (1, 1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x,
        kern,
        (1, 1),
        "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def local_std(x: jax.Array, window_size: int = 7) -> jax.Array:
    """Per-pixel local standard deviation over a box window (NHWC -> NHWC)."""
    w = _box_window(window_size)
    mu = _depthwise(x, w)
    var = _depthwise(x * x, w) - mu * mu
    return jnp.sqrt(jnp.maximum(var, 1e-10))


def map_loss(
    sr: jax.Array,
    hr: jax.Array,
    z: jax.Array,
    window_size: int = 7,
    gain: float = 0.1,
) -> jax.Array:
    """Tie SR local-std deviation from HR to the (window-averaged) Z map.

    L = mean( (localstd(sr) - localstd(hr) - gain * mean_c(z_avg))^2 )

    so z > 0 rewards extra local variance and z < 0 rewards smoothing —
    the monotone control knob the exploration tools (variance up/down) use.
    """
    s_sr = jnp.mean(local_std(sr, window_size), axis=-1)
    s_hr = jnp.mean(local_std(hr, window_size), axis=-1)
    if z.shape[1] != sr.shape[1]:  # Z lives on the LR grid: nearest-upsample
        factor = sr.shape[1] // z.shape[1]
        z = jnp.repeat(jnp.repeat(z, factor, axis=1), factor, axis=2)
    z_avg = jnp.mean(_depthwise(z, _box_window(window_size)), axis=-1)
    return jnp.mean((s_sr - s_hr - gain * z_avg) ** 2)


def charbonnier(x: jax.Array, eps: float = 1e-6):
    return jnp.mean(jnp.sqrt(x * x + eps * eps))


def pixel_loss(sr: jax.Array, hr: jax.Array, kind: str = "l1"):
    if kind == "l1":
        return jnp.mean(jnp.abs(sr - hr))
    if kind == "l2":
        return jnp.mean((sr - hr) ** 2)
    if kind == "cb":
        return charbonnier(sr - hr)
    raise ValueError(f"unknown pixel loss {kind}")


def perceptual_l1(feat_sr: jax.Array, feat_hr: jax.Array):
    """ESRGAN feature loss: L1 in pre-activation VGG space."""
    return jnp.mean(jnp.abs(feat_sr - feat_hr))


def tv_loss(x: jax.Array):
    """Anisotropic total variation (used by the smoothing exploration tool)."""
    dh = jnp.abs(x[:, 1:, :, :] - x[:, :-1, :, :])
    dw = jnp.abs(x[:, :, 1:, :] - x[:, :, :-1, :])
    return jnp.mean(dh) + jnp.mean(dw)
