"""Test-time Z-map optimization engine (SURVEY.md §2.12 / §3.4,
``codes/Z_optimization.py``).

Given a frozen (CEM-wrapped) generator and a user objective over a spatial
region, search the latent Z map minimizing the objective. The reference runs
tens-to-hundreds of host-dispatched Adam-on-Z steps; here the WHOLE loop is
one jitted ``lax.scan`` (Z donated, optimizer state carried) so a 100-step
search is a single device program — SURVEY.md §3.4's "on TPU this loop must
be jit-compiled" note.

Region handling: the crop-around-region speedup uses bucketed crop sizes
(pad-to-bucket, SURVEY.md §7 hard-part 6) so a GUI session triggers at most
``len(buckets)`` compiles; inside the jitted loss the region is a static-
shape float mask.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["optimize_z", "ZOptimizer", "bucket_crop"]

_BUCKETS = (16, 32, 64, 128, 256)


def bucket_crop(box: tuple[int, int, int, int], h: int, w: int, scale: int, buckets=_BUCKETS):
    """Round an LR-space region box (y0, x0, y1, x1) up to a bucketed square
    crop within the image. Returns (y, x, size) in LR coordinates."""
    y0, x0, y1, x1 = box
    need = max(y1 - y0, x1 - x0)
    size = next((b for b in buckets if b >= need), max(h, w))
    size = min(size, min(h, w))
    y = min(max(0, (y0 + y1 - size) // 2), h - size)
    x = min(max(0, (x0 + x1 - size) // 2), w - size)
    return y, x, size


@partial(
    jax.jit,
    static_argnames=("forward", "objective", "n_steps", "lr", "z_range", "lr_decay"),
)
def optimize_z(
    forward,
    params,
    lr_img: jax.Array,
    z0: jax.Array,
    mask_hr: jax.Array,
    objective,
    n_steps: int = 100,
    lr: float = 0.1,
    z_range: float = 1.0,
    lr_decay: float = 1.0,
):
    """Run the full Z search as one device program.

    forward(params, lr_img, z) -> sr;  objective(sr, mask) -> scalar.
    Z is clipped to [-z_range, z_range] each step (the reference bounds its
    latent domain); ``lr_decay`` < 1 applies the reference-style step-LR
    decay across the search (exponential to ``lr * lr_decay`` by the end).
    Returns (z_opt, loss_trace).
    """
    if lr_decay != 1.0:
        schedule = optax.exponential_decay(
            lr, transition_steps=max(n_steps, 1), decay_rate=lr_decay
        )
        tx = optax.adam(schedule)
    else:
        tx = optax.adam(lr)
    opt_state = tx.init(z0)

    def step(carry, _):
        z, opt_state = carry

        def loss_fn(z_):
            sr = forward(params, lr_img, z_)
            return objective(sr, mask_hr)

        loss, grads = jax.value_and_grad(loss_fn)(z)
        updates, opt_state = tx.update(grads, opt_state)
        z = optax.apply_updates(z, updates)
        if z_range:
            z = jnp.clip(z, -z_range, z_range)
        return (z, opt_state), loss

    (z_opt, _), losses = jax.lax.scan(step, (z0, opt_state), None, length=n_steps)
    return z_opt, losses


class ZOptimizer:
    """Stateful convenience wrapper: region cropping + paste-back around
    :func:`optimize_z` (the reference's ``Z_optimizer`` surface)."""

    def __init__(
        self,
        forward,
        params,
        scale: int = 4,
        n_steps: int = 100,
        lr: float = 0.1,
        z_range: float = 1.0,
        crop_to_region: bool = True,
        lr_decay: float = 1.0,
    ):
        self.forward = forward
        self.params = params
        self.scale = scale
        self.n_steps = n_steps
        self.lr = lr
        self.z_range = z_range
        self.crop_to_region = crop_to_region
        self.lr_decay = lr_decay

    def __call__(
        self,
        lr_img: np.ndarray,
        z: np.ndarray,
        objective,
        mask_hr: np.ndarray | None = None,
        box_lr: tuple[int, int, int, int] | None = None,
    ):
        """Optimize Z for ``objective`` over the region.

        ``mask_hr``: float (H_hr, W_hr) weight map (1 inside the region);
        ``box_lr``: optional LR-space bbox enabling the bucketed-crop speedup.
        Returns (z_opt full map, loss_trace).
        """
        lr_img = jnp.asarray(lr_img)
        z = jnp.asarray(z)
        n, h, w, _ = lr_img.shape
        s = self.scale
        if mask_hr is None:
            mask_hr = np.ones((h * s, w * s), np.float32)
        mask_hr = jnp.asarray(mask_hr, jnp.float32)

        if self.crop_to_region and box_lr is not None:
            y, x, size = bucket_crop(box_lr, h, w, s)
            lr_c = jax.lax.dynamic_slice(lr_img, (0, y, x, 0), (n, size, size, lr_img.shape[-1]))
            z_c = jax.lax.dynamic_slice(z, (0, y, x, 0), (n, size, size, z.shape[-1]))
            m_c = jax.lax.dynamic_slice(
                mask_hr, (y * s, x * s), (size * s, size * s)
            )
            z_opt_c, losses = optimize_z(
                self.forward,
                self.params,
                lr_c,
                z_c,
                m_c,
                objective,
                n_steps=self.n_steps,
                lr=self.lr,
                z_range=self.z_range,
                lr_decay=self.lr_decay,
            )
            z_opt = jax.lax.dynamic_update_slice(z, z_opt_c, (0, y, x, 0))
            return z_opt, losses

        return optimize_z(
            self.forward,
            self.params,
            lr_img,
            z,
            mask_hr,
            objective,
            n_steps=self.n_steps,
            lr=self.lr,
            z_range=self.z_range,
            lr_decay=self.lr_decay,
        )
