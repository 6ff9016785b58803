"""Blind-SR downsampling-kernel estimation (KernelGAN-style), TPU-native.

The reference consumes externally-estimated kernels ("e.g. from KernelGAN" —
SURVEY.md §2.10a; `resolve_kernel` reads its ``kernel_x4.mat``) but ships no
estimator. This module closes the blind-SR loop in-framework: estimate the
kernel from the LR image itself, write it where the existing
``opt['kernel']`` -> CEM path picks it up.

Method (Bell-Kligler et al., "Blind Super-Resolution Kernel Estimation using
an Internal-GAN", NeurIPS 2019 — PAPERS.md lineage; reconstructed from the
public paper, no reference code involved):

- **G is a deep LINEAR conv net** (no bias, no nonlinearity) ending in an
  s-stride subsample, so whatever it learns IS a single stationary
  downsampling kernel — its impulse response.
- **D is a small fully-convolutional patch discriminator** trained to tell
  real LR patches from G-downscaled larger LR crops. The internal patch
  recurrence of natural images makes the correct kernel the equilibrium.
- **Kernel regularizers** act on the explicit impulse response: sum-to-1,
  boundary energy penalty, center-of-mass centering, optional sparsity.

TPU-first shape: the whole optimization is ``lax.scan`` chunks of jitted
G/D steps — random crops via ``dynamic_slice`` inside the program, zero
host round-trips per iteration (the torch original dispatches per step).

Deviations from the paper (documented, honest): LSGAN patch loss instead of
the paper's spectral-norm WGAN-ish loss (stabler small-scale, no SN needed);
one stride-s stage for any scale (the paper composes x2 twice for x4);
regularizer weights are reconstructed, not copied.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["KernelGANConf", "LinearKernelG", "PatchD", "effective_kernel", "estimate_kernel"]


@dataclasses.dataclass(frozen=True)
class KernelGANConf:
    scale: int = 4
    g_kernels: tuple = (9, 7, 5, 3, 1, 1)  # support = sum(k-1)+1 = 21
    g_channels: int = 64
    d_kernels: tuple = (7, 1, 1, 1, 1)
    d_channels: int = 64
    g_input: int = 64  # G crop (LR px); D patches are g_input//scale
    lr_g: float = 2e-3
    lr_d: float = 2e-3
    iters: int = 2000
    # regularizer weights (reconstructed — see module docstring)
    w_sum2one: float = 0.5
    w_boundaries: float = 0.5
    w_centralized: float = 1.0
    w_sparse: float = 0.0
    seed: int = 0


class LinearKernelG(nn.Module):
    """Deep linear generator: stride-1 no-bias convs, then ::s subsample.
    Linearity means G == one stationary kernel; depth only shapes the
    optimization landscape (implicit regularization, per the paper)."""

    conf: KernelGANConf

    @nn.compact
    def __call__(self, x, stride: bool = True):
        c = self.conf
        for i, k in enumerate(c.g_kernels):
            feats = 1 if i == len(c.g_kernels) - 1 else c.g_channels
            x = nn.Conv(
                feats, (k, k), padding="SAME", use_bias=False,
                param_dtype=jnp.float32, name=f"conv{i}",
            )(x)
        if stride:
            s = c.scale
            x = x[:, ::s, ::s, :]
        return x


class PatchD(nn.Module):
    """Fully-convolutional patch discriminator -> per-pixel logit map."""

    conf: KernelGANConf

    @nn.compact
    def __call__(self, x):
        c = self.conf
        for i, k in enumerate(c.d_kernels):
            last = i == len(c.d_kernels) - 1
            x = nn.Conv(
                1 if last else c.d_channels, (k, k), padding="VALID",
                param_dtype=jnp.float32, name=f"conv{i}",
            )(x)
            if not last:
                x = nn.leaky_relu(x, negative_slope=0.2)
        return x


def _support(conf: KernelGANConf) -> int:
    return sum(k - 1 for k in conf.g_kernels) + 1


def effective_kernel(g_module: LinearKernelG, g_params, conf: KernelGANConf):
    """The impulse response of the (stride-less) linear G as an explicit
    (support, support) kernel, in CORRELATION convention — i.e.
    ``G(x, stride=False)[i] == sum_t k[t] * x[i + t - center]`` so that
    downstream consumers (CEM's ``conv_general_dilated``, the data
    pipeline) can use it directly. A centered delta probe returns the
    FLIPPED kernel under cross-correlation, hence the final flip; the
    algebra is pinned by ``test_effective_kernel_is_exact``."""
    sup = _support(conf)
    n = 2 * sup + 1  # margin so SAME-pad boundary effects can't reach center
    delta = jnp.zeros((1, n, n, 1)).at[0, n // 2, n // 2, 0].set(1.0)
    resp = g_module.apply({"params": g_params}, delta, stride=False)[0, :, :, 0]
    c, r = n // 2, sup // 2
    k = resp[c - r : c + r + 1, c - r : c + r + 1]
    return k[::-1, ::-1]


def _kernel_regularizers(k: jax.Array, conf: KernelGANConf) -> jax.Array:
    sup = k.shape[0]
    idx = jnp.arange(sup, dtype=jnp.float32)
    center = (sup - 1) / 2.0
    # boundary mask: grows quadratically away from the center (penalize
    # energy far out; keeps the effective support compact)
    d2 = ((idx - center) ** 2)[:, None] + ((idx - center) ** 2)[None, :]
    boundary_mask = d2 / d2.max()
    loss = conf.w_sum2one * jnp.abs(1.0 - jnp.sum(k))
    loss += conf.w_boundaries * jnp.sum(jnp.abs(k) * boundary_mask)
    if conf.w_centralized:
        mass = jnp.sum(jnp.abs(k)) + 1e-8
        com_h = jnp.sum(jnp.abs(k) * idx[:, None]) / mass
        com_w = jnp.sum(jnp.abs(k) * idx[None, :]) / mass
        loss += conf.w_centralized * ((com_h - center) ** 2 + (com_w - center) ** 2)
    if conf.w_sparse:
        loss += conf.w_sparse * jnp.mean(jnp.sqrt(jnp.abs(k) + 1e-8))
    return loss


def _lsgan(logits: jax.Array, target: float) -> jax.Array:
    return jnp.mean((logits - target) ** 2)


def _rand_crop(img, rng, size: int):
    """dynamic_slice random crop of a (H, W, 1) image -> (1, size, size, 1)."""
    h, w = img.shape[0], img.shape[1]
    rh, rw = jax.random.split(rng)
    oy = jax.random.randint(rh, (), 0, h - size + 1)
    ox = jax.random.randint(rw, (), 0, w - size + 1)
    return jax.lax.dynamic_slice(img, (oy, ox, 0), (size, size, 1))[None]


def make_kernelgan_step(g_module, d_module, conf: KernelGANConf, img_shape):
    """One (G update, D update) iteration as a pure function
    ``(g_state, d_state, img, rng) -> (g_state', d_state', metrics)``."""
    del img_shape  # shapes are static per jit trace anyway

    def step(g_state, d_state, img, rng):
        rng_g, rng_real, rng_fake = jax.random.split(rng, 3)
        g_in = _rand_crop(img, rng_fake, conf.g_input)
        real = _rand_crop(img, rng_real, conf.g_input // conf.scale)

        def g_loss_fn(g_params):
            fake = g_module.apply({"params": g_params}, g_in)
            adv = _lsgan(d_module.apply({"params": d_state.params}, fake), 1.0)
            k = effective_kernel(g_module, g_params, conf)
            reg = _kernel_regularizers(k, conf)
            return adv + reg, (fake, adv, reg)

        (l_g, (fake, adv, reg)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(g_state.params)
        g_state = g_state.apply_gradients(grads=g_grads)
        fake_sg = jax.lax.stop_gradient(fake)

        def d_loss_fn(d_params):
            lr_real = d_module.apply({"params": d_params}, real)
            lr_fake = d_module.apply({"params": d_params}, fake_sg)
            return (_lsgan(lr_real, 1.0) + _lsgan(lr_fake, 0.0)) / 2.0

        l_d, d_grads = jax.value_and_grad(d_loss_fn)(d_state.params)
        d_state = d_state.apply_gradients(grads=d_grads)
        return g_state, d_state, {"l_g": l_g, "l_d": l_d, "adv": adv, "reg": reg}

    return step


def estimate_kernel(
    lr_image: np.ndarray,
    conf: KernelGANConf | None = None,
    progress=None,
    loss_override=None,
) -> tuple[np.ndarray, dict]:
    """Estimate the downsampling kernel of ``lr_image`` (HWC or HW float
    [0,1]). Returns ``(kernel, metrics)``: a unit-sum (support, support)
    float64 kernel ready for ``opt['kernel']`` / ``CEMConf(kernel=...)``,
    and the last chunk's loss scalars.

    The estimator runs on the image's luminance (one channel — the kernel is
    shared across RGB, as in the paper). ``lax.scan`` chunks of 100 iters
    keep it one dispatch per chunk; ``progress(done, total, metrics)`` is
    called between chunks. ``loss_override(fake, g_in)`` replaces the
    adversarial term (testing hook: a supervised L2-to-oracle turns the GAN
    into a deterministic inverse problem)."""
    import optax
    from flax.training.train_state import TrainState

    conf = conf or KernelGANConf()
    img = np.asarray(lr_image, np.float32)
    if img.ndim == 3:
        img = img.mean(axis=-1)  # luminance-ish; kernel is color-agnostic
    if min(img.shape) < conf.g_input:
        raise ValueError(
            f"image {img.shape} smaller than g_input {conf.g_input}; "
            "shrink KernelGANConf.g_input"
        )
    img = jnp.asarray(img[..., None])

    g_module = LinearKernelG(conf)
    d_module = PatchD(conf)
    rng = jax.random.PRNGKey(conf.seed)
    r_g, r_d, r_train = jax.random.split(rng, 3)
    probe = jnp.zeros((1, conf.g_input, conf.g_input, 1))
    g_params = g_module.init(r_g, probe)["params"]
    d_params = d_module.init(r_d, probe[:, :: conf.scale, :: conf.scale])["params"]
    g_state = TrainState.create(
        apply_fn=g_module.apply, params=g_params, tx=optax.adam(conf.lr_g, b1=0.5)
    )
    d_state = TrainState.create(
        apply_fn=d_module.apply, params=d_params, tx=optax.adam(conf.lr_d, b1=0.5)
    )

    step = make_kernelgan_step(g_module, d_module, conf, img.shape)
    if loss_override is not None:
        step = _override_step(g_module, conf, loss_override)

    @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(3,))
    def chunk_fn(g_state, d_state, rng0, n_chunk):
        def body(carry, i):
            g, d = carry
            g, d, m = step(g, d, img, jax.random.fold_in(rng0, i))
            return (g, d), m

        (g_state, d_state), ms = jax.lax.scan(
            body, (g_state, d_state), jnp.arange(n_chunk)
        )
        return g_state, d_state, jax.tree.map(lambda x: x[-1], ms)

    chunk = 100
    metrics = {}
    for lo in range(0, conf.iters, chunk):
        n = min(chunk, conf.iters - lo)
        g_state, d_state, metrics = chunk_fn(
            g_state, d_state, jax.random.fold_in(r_train, lo), n
        )
        if progress is not None:
            progress(lo + n, conf.iters, {k: float(v) for k, v in metrics.items()})

    k = np.asarray(effective_kernel(g_module, g_state.params, conf), np.float64)
    if k.sum() <= 1e-8:  # pathological sign/degenerate guard — keep normalizable
        k = np.abs(k)
    k = k / k.sum()
    return k, {key: float(v) for key, v in metrics.items()}


def _override_step(g_module, conf: KernelGANConf, loss_override):
    """Testing/supervised variant of the step: the adversarial term is
    replaced by ``loss_override(fake, g_in)``; D is untouched."""

    def step(g_state, d_state, img, rng):
        _, rng_fake = jax.random.split(rng)
        g_in = _rand_crop(img, rng_fake, conf.g_input)

        def g_loss_fn(g_params):
            fake = g_module.apply({"params": g_params}, g_in)
            main = loss_override(fake, g_in)
            k = effective_kernel(g_module, g_params, conf)
            reg = _kernel_regularizers(k, conf)
            return main + reg, (main, reg)

        (l_g, (main, reg)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            g_state.params
        )
        g_state = g_state.apply_gradients(grads=g_grads)
        return g_state, d_state, {"l_g": l_g, "l_d": jnp.float32(0.0), "adv": main, "reg": reg}

    return step
