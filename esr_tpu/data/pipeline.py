"""jit-fused on-device preprocessing (SURVEY.md §3.5 + BASELINE north_star:
"HR crop -> kernel-blur -> bicubic-LR pairing, augmentation fused into a
jit-compiled preprocessing graph").

The host hands over stacked HR crops (uint8/float, static shapes); a single
jitted graph then does: normalize -> optional extra blur kernel -> MATLAB-
bicubic LR synthesis (two MXU matmuls, esr_tpu.ops.resize) -> joint flip/rot90
augmentation (lax.switch over the 8 dihedral elements, per-sample) -> optional
Z-map draw. Zero host round-trips inside the step; the output feeds the
train step directly (and XLA fuses pipeline + model into one program when
called under the same jit).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from esr_tpu.ops.resize import imresize

__all__ = ["make_train_pipeline", "dihedral_transform", "draw_z"]


def dihedral_transform(img: jax.Array, code: jax.Array) -> jax.Array:
    """Apply one of 8 flip/rot90 symmetries to an HWC image (square)."""
    branches = [
        lambda x: x,
        lambda x: x[:, ::-1, :],
        lambda x: x[::-1, :, :],
        lambda x: x[::-1, ::-1, :],
        lambda x: jnp.swapaxes(x, 0, 1),
        lambda x: jnp.swapaxes(x, 0, 1)[:, ::-1, :],
        lambda x: jnp.swapaxes(x, 0, 1)[::-1, :, :],
        lambda x: jnp.swapaxes(x, 0, 1)[::-1, ::-1, :],
    ]
    return jax.lax.switch(code, branches, img)


def draw_z(rng: jax.Array, shape, kind: str = "uniform") -> jax.Array:
    """Random latent Z map in [-1, 1] (per-step draw for explorable training)."""
    if kind == "uniform":
        return jax.random.uniform(rng, shape, minval=-1.0, maxval=1.0)
    if kind == "normal":
        return jax.random.normal(rng, shape)
    if kind == "zeros":
        return jnp.zeros(shape)
    raise ValueError(kind)


def make_train_pipeline(
    scale: int = 4,
    use_flip: bool = True,
    use_rot: bool = True,
    blur_kernel=None,
    num_latent_channels: int = 0,
    z_kind: str = "uniform",
    downsample_fn=None,
):
    """Build the fused device preprocessing fn.

    Returns ``pipe(hr_batch, rng) -> {'HR', 'LR'[, 'Z']}`` where ``hr_batch``
    is (N, H, W, C) uint8 or float[0,1]; jit-able and donate-able.

    ``hr_batch`` may instead be a dict ``{'HR': ..., 'LR': ...}`` of paired
    crops (dataset has ``dataroot_LR``): the provided LR is used verbatim —
    augmented jointly with HR by the same dihedral code — and LR synthesis is
    skipped, so non-bicubic/real-degradation pairs train on their true LR.

    ``downsample_fn`` overrides the MATLAB-bicubic LR synthesis (e.g.
    ``cem.downsample`` for a user/KernelGAN-estimated kernel so training LR
    and CEM consistency share the same operator); ``blur_kernel`` applies an
    extra blur before the bicubic instead.
    """
    blur = None if blur_kernel is None else jnp.asarray(blur_kernel, jnp.float32)

    def _norm(x):
        return (x / 255.0 if x.dtype == jnp.uint8 else x).astype(jnp.float32)

    def pipe(hr_batch, rng: jax.Array) -> dict:
        lr_in = None
        if isinstance(hr_batch, dict):
            lr_in = hr_batch.get("LR")
            hr_batch = hr_batch["HR"]
        hr = _norm(hr_batch)
        n = hr.shape[0]
        rng_aug, rng_z = jax.random.split(rng)

        if use_rot and hr.shape[1] != hr.shape[2]:
            # the rot90/transpose branches change (H, W) — lax.switch traces
            # every branch, so even the identity draw would fail cryptically
            raise ValueError(
                f"use_rot requires square train crops, got {hr.shape[1]}x"
                f"{hr.shape[2]} — set use_rot: false for non-square crops"
            )
        if use_flip and not use_rot:
            # hflip-only subgroup {I, H} is shape-preserving: keep it a
            # 2-way select so non-square crops (train_spatial's tall-crop
            # regime) can still flip-augment
            fc = jax.random.randint(rng_aug, (n,), 0, 2)
            hr = jnp.where(fc[:, None, None, None] == 1, hr[:, :, ::-1, :], hr)
            if lr_in is not None:
                lr_in = _norm(lr_in)
                lr_in = jnp.where(
                    fc[:, None, None, None] == 1, lr_in[:, :, ::-1, :], lr_in
                )
        elif use_flip or use_rot:
            if use_flip and use_rot:
                codes = jax.random.randint(rng_aug, (n,), 0, 8)
            else:
                # rot-only subgroup {I, V, T, T.V} — matches the host path
                # (data/util.py augment with hflip=False: vflip/rot90 only)
                rot_codes = jnp.asarray([0, 2, 4, 5], jnp.int32)
                codes = rot_codes[jax.random.randint(rng_aug, (n,), 0, 4)]
            hr = jax.vmap(dihedral_transform)(hr, codes)
            if lr_in is not None:  # same symmetry keeps the pair aligned
                lr_in = jax.vmap(dihedral_transform)(_norm(lr_in), codes)
        elif lr_in is not None:
            lr_in = _norm(lr_in)

        if lr_in is not None:
            out = {"HR": hr, "LR": lr_in}
            if num_latent_channels:
                out["Z"] = draw_z(
                    rng_z, lr_in.shape[:-1] + (num_latent_channels,), z_kind
                )
            return out

        src = hr
        if blur is not None:
            c = hr.shape[-1]
            kern = jnp.tile(blur[:, :, None, None], (1, 1, 1, c))
            src = jax.lax.conv_general_dilated(
                src,
                kern,
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=jax.lax.Precision.HIGHEST,
                feature_group_count=c,
            )
        lr = downsample_fn(src) if downsample_fn is not None else imresize(src, scale=1.0 / scale)

        out = {"HR": hr, "LR": lr}
        if num_latent_channels:
            out["Z"] = draw_z(
                rng_z, lr.shape[:-1] + (num_latent_channels,), z_kind
            )
        return out

    return pipe
