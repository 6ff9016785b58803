"""Z-optimization objective library (SURVEY.md §2.12).

Behavioral spec from the reference's ``codes/Z_optimization.py`` objective
set, which backs the GUI exploration tools (SURVEY.md §2.16): L1-to-target
("imprint" desired content), local-variance up/down, brightness, TV
smoothing, periodicity (similarity under shifts along a direction at a given
period), and random diverse alternatives. Each builder returns a pure
``objective(sr, mask) -> scalar`` where ``sr`` is the full SR image (N,H,W,C)
and ``mask`` a float (H,W) region weight map — jit/grad-safe, no dynamic
shapes (masking instead of cropping inside the jitted loss).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from esr_tpu.models.losses import local_std

__all__ = [
    "imprint_objective",
    "variance_objective",
    "brightness_objective",
    "tv_objective",
    "periodicity_objective",
    "random_diverse_objective",
    "adversarial_objective",
]


def _masked_mean(x: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean of x weighted by mask broadcast over batch/channel dims."""
    m = mask[None, :, :, None]
    return jnp.sum(x * m) / (jnp.sum(m) * x.shape[0] * x.shape[-1] + 1e-12)


def imprint_objective(target: jax.Array):
    """L1 to a desired image patch (graffiti/imprinting tool). ``target`` is
    a full-size (H,W,C) image (content outside the mask is ignored)."""

    def objective(sr, mask):
        return _masked_mean(jnp.abs(sr - target[None]), mask)

    return objective


def variance_objective(direction: float = 1.0, window: int = 7):
    """Push local std up (direction>0) or down (direction<0) in the region."""

    def objective(sr, mask):
        return -direction * _masked_mean(local_std(sr, window), mask)

    return objective


def brightness_objective(target_level: float):
    """Drive the region's mean intensity toward ``target_level``."""

    def objective(sr, mask):
        mean = _masked_mean(sr, mask)
        return (mean - target_level) ** 2

    return objective


def tv_objective():
    """Total-variation smoothing of the region."""

    def objective(sr, mask):
        dh = jnp.abs(sr[:, 1:] - sr[:, :-1]) * mask[None, 1:, :, None]
        dw = jnp.abs(sr[:, :, 1:] - sr[:, :, :-1]) * mask[None, :, 1:, None]
        denom = jnp.sum(mask) * sr.shape[0] * sr.shape[-1] + 1e-12
        return (jnp.sum(dh) + jnp.sum(dw)) / denom

    return objective


def periodicity_objective(period_y: float = 0.0, period_x: float = 0.0):
    """Encourage the region to be self-similar under a shift of
    (period_y, period_x) pixels (1D or 2D periodicity tool). Fractional
    periods use bilinear resampling of the shifted image."""
    shifts = []
    if period_y:
        shifts.append((float(period_y), 0.0))
    if period_x:
        shifts.append((0.0, float(period_x)))
    if not shifts:
        raise ValueError("need a nonzero period")

    import math

    def shift_img(img, dy, dx):
        # integer fast path; fractional via two-tap blend per axis (periods
        # are static config, so shifts resolve at trace time)
        def shift_axis(x, d, axis):
            lo = jnp.roll(x, -math.floor(d), axis=axis)
            hi = jnp.roll(x, -math.ceil(d), axis=axis)
            frac = d - math.floor(d)
            return lo * (1 - frac) + hi * frac

        out = img
        if dy:
            out = shift_axis(out, dy, 1)
        if dx:
            out = shift_axis(out, dx, 2)
        return out

    def objective(sr, mask):
        loss = 0.0
        for dy, dx in shifts:
            shifted = shift_img(sr, dy, dx)
            shifted_mask = shift_img(mask[None, :, :, None], dy, dx)[0, :, :, 0]
            joint = mask * shifted_mask  # only compare where both in-region
            loss += _masked_mean(jnp.abs(sr - shifted), joint)
        return loss / len(shifts)

    return objective


def random_diverse_objective(anchors: jax.Array, weight_repel: float = 1.0):
    """Produce an alternative that moves away from previous outputs
    (``anchors``: (K,H,W,C)) — the 'random diverse alternatives' tool."""

    def objective(sr, mask):
        d = jnp.abs(sr[None] - anchors[:, None])  # (K,N,H,W,C)
        m = mask[None, None, :, :, None]
        repel = jnp.sum(d * m) / (jnp.sum(m) * d.shape[0] * d.shape[1] * d.shape[-1] + 1e-12)
        return -weight_repel * repel

    return objective


def histogram_objective(target_patch: jax.Array, n_bins: int = 32, sigma: float = 0.05):
    """Match the region's intensity distribution to a target patch's (the
    texture/histogram-transfer tool): soft (gaussian-kernel) histograms per
    channel, L1 between normalized histograms — differentiable and
    shape-static.

    ``target_patch``: (h, w, C) or (K, C) sample of desired intensities.
    """
    centers = jnp.linspace(0.0, 1.0, n_bins)
    tgt = target_patch.reshape(-1, target_patch.shape[-1])

    def soft_hist(values, weights):
        # values: (M, C); weights: (M, 1) region weights
        d = values[:, None, :] - centers[None, :, None]  # (M, bins, C)
        k = jnp.exp(-0.5 * (d / sigma) ** 2) * weights[:, :, None]
        h = jnp.sum(k, axis=0)
        return h / (jnp.sum(h, axis=0, keepdims=True) + 1e-12)

    def objective(sr, mask):
        vals = sr.reshape(-1, sr.shape[-1])
        w = jnp.broadcast_to(mask[None, :, :], sr.shape[:3]).reshape(-1, 1)
        h_sr = soft_hist(vals, w)
        h_tgt = soft_hist(tgt, jnp.ones((tgt.shape[0], 1), tgt.dtype))
        return jnp.mean(jnp.abs(h_sr - h_tgt))

    return objective


def adversarial_objective(d_apply, direction: float = 1.0):
    """Drive D's realism score up (direction>0) on the full image; requires a
    trained discriminator apply ``d_apply(sr) -> logits``."""

    def objective(sr, mask):
        return -direction * jnp.mean(d_apply(sr))

    return objective
